"""Pins tools/profile_chain.hlo_kind against real axon trace long_names.

The profiler's op-kind parser has produced two wrong perf tables already
(PERF.md "Corrected profile attribution" + "r4 train step" sections):
1. substring-matching 'custom-call' counted fusions that merely CONSUME a
   Pallas output as custom calls (4x inflation, round 2/3);
2. requiring a single 'type[shape]{layout}' before the kind sent all
   TUPLE-typed ops (conv weight-grads, flash-attn bwd = most of the backward
   pass) into 'other' (33% of the train-step trace, round 4).
Samples below are verbatim (truncated) long_names from on-chip traces.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from profile_chain import categorize, hlo_kind


SINGLE_FUSION = (
    "%fusion.1322 = bf16[18,32,32,320]{3,0,2,1:T(8,128)(2,1)} "
    "fusion(bf16[18,32,32,320]{3,0,2,1:T(8,128)(2,1)} %copy-done.1), "
    "kind=kOutput"
)
TUPLE_FUSION = (
    "%convert_reduce_fusion.10 = (f32[18,128]{1,0:T(8,128)S(1)}, "
    "bf16[18,128,128,128]{3,0,2,1:T(8,128)(2,1)S(1)}) "
    "fusion(bf16[128]{0:T(256)(128)(2,1)S(1)} %copy-done.8973, "
    "bf16[3,3,128,128]{3,2,1,0:T(8,128)"
)
TUPLE_CUSTOM_CALL = (
    "%attn1.67 = (f32[18,1024,320]{2,1,0:T(8,128)S(1)}, "
    "f32[18,1024,320]{2,1,0:T(8,128)S(1)}, "
    "f32[18,1024,320]{2,1,0:T(8,128)S(1)}) "
    "custom-call(bf16[18,1024,320]{2,1,0:T(8,128)(2,1)} %copy-done.1603, bf16["
)
# bug-1 regression shape: a plain fusion whose OPERAND was produced by a
# custom call — the substring 'custom-call' must not win over the true kind.
FUSION_CONSUMING_CUSTOM_CALL = (
    "%fusion.9 = f32[8,4096,40]{2,1,0:T(8,128)} "
    "fusion(f32[8,4096,40]{2,1,0:T(8,128)} %custom-call.attn_fwd.3), "
    "kind=kLoop"
)
SINGLE_COPY = "%copy.5 = bf16[8,64,64,4]{3,2,1,0:T(8,128)(2,1)} copy(bf16[8,64,64,4]{3,0,2,1:T(8,128)(2,1)} %p0)"


def test_single_type_fusion():
    assert hlo_kind(SINGLE_FUSION) == "fusion"


def test_tuple_type_fusion_is_not_other():
    assert hlo_kind(TUPLE_FUSION) == "fusion"
    assert categorize("convert_reduce_fusion.10", TUPLE_FUSION) == \
        "fusion(matmul/conv/elementwise)"


def test_tuple_type_custom_call():
    assert hlo_kind(TUPLE_CUSTOM_CALL) == "custom-call"
    assert categorize("attn1.67", TUPLE_CUSTOM_CALL) == "pallas_flash_attn"


def test_fusion_consuming_custom_call_output_stays_fusion():
    assert hlo_kind(FUSION_CONSUMING_CUSTOM_CALL) == "fusion"


def test_layout_tokens_do_not_match_as_kind():
    # T(8,128) / S(1) / (2,1) inside layouts must never be parsed as the kind.
    assert hlo_kind(SINGLE_COPY) == "copy"
    assert categorize("copy.5", SINGLE_COPY) == "copy/transpose"


def test_missing_long_name_is_other():
    assert hlo_kind("") == "?"
    assert categorize("mystery", "") == "other"
