"""utils/health.py: conv-impl routing logic + probe smoke test."""

import pytest

from vosdetectron_tpu.utils.health import choose_conv_impl, quick_probe


def test_choose_conv_impl_prefers_native():
    # healthy toolchain: native convs win -> stay native
    assert choose_conv_impl({"conv_native_tflops": 5.0,
                             "conv_dots_tflops": 2.0}) == "native"
    # marginal dots win is NOT enough (dots costs K*K HBM re-reads)
    assert choose_conv_impl({"conv_native_tflops": 1.0,
                             "conv_dots_tflops": 2.0}) == "native"
    # regressed native lowering (2026-08-18: 0.2 vs 2.3 TF/s) -> dots
    assert choose_conv_impl({"conv_native_tflops": 0.2,
                             "conv_dots_tflops": 2.3}) == "dots"
    # missing/zero readings -> safe default
    assert choose_conv_impl({}) == "native"
    assert choose_conv_impl({"conv_native_tflops": 0.0,
                             "conv_dots_tflops": 9.0}) == "native"


def test_quick_probe_budget_truncates():
    h = quick_probe(small=True, budget_s=0.0)
    assert h.get("probe_truncated") == 1.0
    # choose_conv_impl degrades safely on a truncated probe
    assert choose_conv_impl(h) == "native"


@pytest.mark.slow
def test_quick_probe_smoke():
    h = quick_probe(small=True)
    for k in ("rtt_ms", "matmul_tflops", "conv_native_tflops",
              "conv_dots_tflops", "elementwise_gbps", "upload_mbps",
              "download_mbps"):
        assert k in h and h[k] > 0
