"""Unit tests for bench.py's scaling-measurement protocol.

The recorded N->4N efficiency is the round artifact the judge reads,
and it is produced unattended on a host whose hypervisor throttles
CPU 2-3x between identical runs (BENCH/BASELINE.md).  These tests
drive ``measure_scaling`` with scripted child walls (no Spark, no
sleeps) to pin the estimator's behavior:

* per-pair ratios are clipped at 1.0 (a >1 pair means the lo child
  ran throttled, not superlinear scaling);
* a pair counts toward the headline only when BOTH its walls sit
  within the calibrated idle-window bounds (absolute-wall gate,
  never the ratio);
* the self-heal retries until two pairs are valid, bounded at
  ``MAX_EXTRA_PAIRS`` and the phase wall-clock budget, and falls back
  to the all-pairs clipped median with ``valid_pairs: 0`` when an
  entire phase runs throttled;
* (round 5) pairs are probe-gated: a dirty window defers the pair
  (idle instead of burn), every probe wall lands in the artifact.
"""

import pytest

import bench


TOKENS = 479_656_987


def _scripted(monkeypatch, lo_walls, hi_walls, probes=None):
    """Patch child_encode to replay scripted walls and kill sleeps.

    ``measure_scaling`` alternates start side per pair, but always
    appends lo-children to lo_runs and hi-children to hi_runs; we key
    the script on the requested core count, not call order.

    ``probes``: scripted probe_window results (dicts); default stubs
    every probe CLEAN so pre-round-5 expectations hold unchanged.
    """
    seq = {bench.SCALING_CORES_LO: iter(lo_walls),
           bench.SCALING_CORES_HI: iter(hi_walls)}

    def fake_child(cores, repeats=1):
        try:
            wall = next(seq[cores])
        except StopIteration:  # pragma: no cover - script exhausted
            pytest.fail(f"unexpected extra child at {cores} cores")
        return {"walls": [wall], "tokens": TOKENS}

    monkeypatch.setattr(bench, "child_encode", fake_child)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    # pin bounds to the calibrated sf0.1 values (25 s hi / 100 s lo)
    monkeypatch.setattr(bench, "SF_DIR", "/root/testdata/sf0.1")

    probe_script = iter(probes) if probes is not None else None

    def fake_probe(hi_bound, attempts=3, idles=(180.0, 300.0), deadline=None):
        if probe_script is None:
            return {"walls": [], "clean": True}
        try:
            return next(probe_script)
        except StopIteration:
            return {"walls": [], "clean": True}

    monkeypatch.setattr(bench, "probe_window", fake_probe)


def test_clean_window_no_retries(monkeypatch):
    _scripted(monkeypatch, [80.0, 84.0, 88.0], [20.0, 21.0, 22.0])
    s = bench.measure_scaling()
    assert s["extra_pairs"] == 0
    assert s["valid_pairs"] == 3
    assert s["pair_valid"] == [True, True, True]
    # pair ratios 1.00, 1.00, 1.00 -> headline 1.0
    assert s["efficiency_n_to_4n"] == 1.0
    assert s["walls_lo"] == [80.0, 84.0, 88.0]


def test_lo_throttled_pair_is_clipped_and_excluded(monkeypatch):
    # pair 1: lo 110 s (> 100 bound) with clean hi 20 s -> raw ratio
    # 1.375, clipped to 1.0 AND excluded by the lo-wall gate; pairs
    # 2-3 clean at 0.9 / 0.85.
    _scripted(monkeypatch, [110.0, 72.0, 68.0], [20.0, 20.0, 20.0])
    s = bench.measure_scaling()
    assert s["extra_pairs"] == 0
    assert s["pair_valid"] == [False, True, True]
    assert s["per_pair_efficiencies_raw"][0] == 1.375
    assert s["per_pair_efficiencies"][0] == 1.0
    # headline = median over the two VALID pairs only
    assert s["efficiency_n_to_4n"] == round((0.9 + 0.85) / 2, 3)


def test_retries_until_two_valid(monkeypatch):
    # base pairs: hi side throttled (30/28/26 s, all > 25); retries
    # recover (24 s then 23 s) -> two valid pairs, stop at +2.
    _scripted(
        monkeypatch,
        [80.0, 80.0, 80.0, 80.0, 82.8],
        [30.0, 28.0, 26.0, 24.0, 23.0],
    )
    s = bench.measure_scaling()
    assert s["extra_pairs"] == 2
    assert s["valid_pairs"] == 2
    assert s["pair_valid"] == [False, False, False, True, True]
    # valid pair ratios: 80/(4*24)=0.833..., 82.8/(4*23)=0.9
    assert s["efficiency_n_to_4n"] == round((80 / 96 + 0.9) / 2, 3)
    # pre-retry estimate stays visible: median of the 3 clipped base
    # pairs 0.667/0.714/0.769
    assert s["efficiency_fixed_pairs"] == round(80 / (4 * 28), 3)


def test_all_throttled_falls_back_with_zero_valid(monkeypatch):
    # an entire phase over the hi bound: 3 base + the full retry
    # budget all invalid -> headline falls back to the all-pairs
    # clipped median and says so via valid_pairs=0.
    n = 3 + bench.MAX_EXTRA_PAIRS
    lo = [80.0] * n
    hi = [40.0 - 1.0 * i for i in range(n)]  # 40, 39, ... all > 25
    _scripted(monkeypatch, lo, hi)
    s = bench.measure_scaling()
    assert s["extra_pairs"] == bench.MAX_EXTRA_PAIRS
    assert s["valid_pairs"] == 0
    assert s["pair_valid"] == [False] * n
    assert s["efficiency_n_to_4n"] == s["efficiency_all_pairs"]
    # median of 80/(4*hi) over all pairs = the middle hi wall
    mid = sorted(hi)[n // 2]
    assert s["efficiency_n_to_4n"] == round(80 / (4 * mid), 3)


def test_dirty_probe_defers_pair_until_clean(monkeypatch):
    """A throttled window between retries must IDLE (deferral), not
    burn a pair: with 2 dirty probes before a clean one, exactly one
    extra pair runs and the deferrals are recorded in the artifact."""
    _scripted(
        monkeypatch,
        [80.0, 80.0, 80.0, 80.0],
        [30.0, 28.0, 20.0, 21.0],
        probes=[
            {"walls": [], "clean": True},            # pre-phase
            {"walls": [31.2], "clean": False},       # retry probe 1: dirty
            {"walls": [27.9], "clean": False},       # retry probe 2: dirty
            {"walls": [21.5], "clean": True},        # retry probe 3: clean
        ],
    )
    s = bench.measure_scaling()
    # base pairs: [80,30] invalid, [80,28] invalid, [80,20] valid ->
    # one retry pair needed; it launches only after the clean probe
    assert s["extra_pairs"] == 1
    assert s["valid_pairs"] == 2
    assert s["window_probe"]["deferred_pairs"] == 2
    assert [p["clean"] for p in s["window_probe"]["retries"]] == [
        False, False, True,
    ]
    assert s["window_probe"]["pre_phase"]["clean"] is True


def test_zero_budget_skips_retries(monkeypatch):
    """With no scaling budget left, the retry loop must not idle or
    spawn pairs — base pairs only, honest fallback headline."""
    _scripted(monkeypatch, [80.0, 80.0, 80.0], [30.0, 30.0, 30.0])
    s = bench.measure_scaling(budget_sec=0.0)
    assert s["extra_pairs"] == 0
    assert s["valid_pairs"] == 0
    assert s["window_probe"]["retries"] == []


def test_probe_window_retries_then_clean(monkeypatch):
    """probe_window itself: walls accumulate until one reads within
    the bound; every wall is reported."""
    walls = iter([31.0, 27.0, 22.0])
    monkeypatch.setattr(
        bench, "child_encode",
        lambda cores, repeats=1: {"walls": [next(walls)], "tokens": TOKENS},
    )
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    p = bench.probe_window(25.0, attempts=3)
    assert p == {"walls": [31.0, 27.0, 22.0], "clean": True}


def test_probe_window_all_dirty(monkeypatch):
    walls = iter([31.0, 27.0])
    monkeypatch.setattr(
        bench, "child_encode",
        lambda cores, repeats=1: {"walls": [next(walls)], "tokens": TOKENS},
    )
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    p = bench.probe_window(25.0, attempts=2)
    assert p == {"walls": [31.0, 27.0], "clean": False}


def test_scaling_factor_tracks_core_constants():
    """ADVICE r4: the efficiency formula's factor must derive from the
    core-count constants, not a hard-coded 4."""
    assert bench.SCALING_FACTOR == (
        bench.SCALING_CORES_HI // bench.SCALING_CORES_LO
    )


def test_bounds_scale_with_sf(monkeypatch):
    # at sf0.01 the job is 10x smaller; bounds scale linearly, so a
    # 2.4 s hi wall (under 2.5) is valid and a 2.6 s one is not.
    _scripted(monkeypatch, [8.0, 8.0, 8.0], [2.4, 2.4, 2.6])
    monkeypatch.setattr(bench, "SF_DIR", "/root/testdata/sf0.01")
    s = bench.measure_scaling()
    assert s["hi_bound_sec"] == 2.5
    assert s["lo_bound_sec"] == 10.0
    assert s["pair_valid"] == [True, True, False]


def test_probe_window_zero_budget_spends_no_child(monkeypatch):
    """ADVICE r5: with no budget remaining (deadline already passed),
    probe_window must return immediately WITHOUT launching a hi-core
    child — budget_sec=0 previously still burned ~35 s of 4-core work."""
    import time as _time

    def no_child(cores, repeats=1):  # pragma: no cover - must not run
        pytest.fail("probe_window spent a child with zero budget")

    monkeypatch.setattr(bench, "child_encode", no_child)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    p = bench.probe_window(25.0, attempts=3, deadline=_time.monotonic())
    assert p == {"walls": [], "clean": False}


def _full_result_like_r5():
    """A full bench result shaped (and sized) like the round-5 run
    whose one-line serialization outgrew the driver's capture."""
    queries = {"encode": 10.2, "verify_roundtrip": 4.1}
    queries.update({f"q{i:02d}_some_query_name_here": 1.234 for i in range(1, 13)})
    return {
        "metric": "encode+verify+queries wall (tokens table + driver tables)",
        "value": 55.55,
        "unit": "sec",
        "queries": queries,
        "sf": 0.1,
        "encode_tokens_per_sec": 46_800_000,
        "encode_tokens": 119_913_021,
        "encode_file_aligned_sec": 3.98,
        "encode_file_aligned_tokens_per_sec": 30_100_000,
        "decode_sec": 2.781,
        "decode_tokens_per_sec": 43_137_128,
        "compression_ratio_vs_parquet_snappy": 0.7088,
        "roundtrip_mismatches": 0,
        "llm_ops": {
            **{f"op_{i}_some_measured_row_sec": 1.0 for i in range(20)},
            # every key the headline whitelist can pick must be present
            # so the size test reflects the real worst-case line
            "salting_speedup": 4.05,
            "ann_ivf_recall_at10": 1.0, "ann_ivf_scan_frac": 0.128,
            "ann_rplsh_recall_at10": 1.0, "ann_rplsh_scan_frac": 0.06,
            "ann_pq_recall_at10": 1.0, "ann_pq_code_bytes_frac": 0.0312,
        },
        "scaling": {
            "cores_lo": 1, "cores_hi": 4,
            "walls_lo": [77.5, 65.4, 74.8, 103.1, 64.0],
            "walls_hi": [43.9, 26.9, 21.1, 21.6, 18.4],
            "tokens": TOKENS,
            "tokens_per_sec_lo": 6_404_478,
            "tokens_per_sec_hi": 22_141_762,
            "estimator": "x" * 400,
            "per_pair_efficiencies_raw": [0.441, 0.608, 0.887, 1.19, 0.867],
            "per_pair_efficiencies": [0.441, 0.608, 0.887, 1.0, 0.867],
            "pair_valid": [False, False, True, False, True],
            "valid_pairs": 2,
            "efficiency_n_to_4n": 0.877,
            "window_probe": {"pre_phase": {"walls": [47.4, 38.0, 31.4],
                                           "clean": False}},
            "budget_sec": 2600.0,
        },
        "bench_total_sec": 2841.5,
    }


def test_headline_fits_driver_capture_and_carries_north_rule_keys():
    """VERDICT r5 item 1: the FINAL stdout line must stay within the
    driver's ~2000-char tail capture and carry the headline evidence
    (throughputs, compression, mismatches, scaling efficiency)."""
    import json as _json

    full = _full_result_like_r5()
    head = bench.headline_of(full)
    line = _json.dumps(head)
    assert len(line) <= bench.HEADLINE_MAX_CHARS
    # driver contract keys
    for k in ("metric", "value", "unit", "queries", "sf"):
        assert k in head
    # north-rule evidence keys
    assert head["encode_tokens_per_sec"] == 46_800_000
    assert head["decode_tokens_per_sec"] == 43_137_128
    assert head["compression_ratio_vs_parquet_snappy"] == 0.7088
    assert head["roundtrip_mismatches"] == 0
    assert head["scaling"]["efficiency_n_to_4n"] == 0.877
    assert head["scaling"]["valid_pairs"] == 2
    assert head["detail_file"] == bench.DETAIL_FILE


def test_headline_drops_fields_rather_than_overflow():
    import json as _json

    full = _full_result_like_r5()
    # pathologically wide query set: the fallback must shed fields,
    # never emit an over-cap line
    full["queries"] = {f"q_{i}_very_long_query_label_padding": 1.0
                      for i in range(200)}
    head = bench.headline_of(full)
    assert len(_json.dumps(head)) <= bench.HEADLINE_MAX_CHARS
    assert head["scaling"]["efficiency_n_to_4n"] == 0.877


def test_print_result_writes_detail_and_prints_compact_line(
    monkeypatch, tmp_path, capsys
):
    import json as _json
    import os as _os

    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    full = _full_result_like_r5()
    bench.print_result(full)
    out_lines = capsys.readouterr().out.strip().splitlines()
    # final stdout line is the compact headline
    head = _json.loads(out_lines[-1])
    assert len(out_lines[-1]) <= bench.HEADLINE_MAX_CHARS
    assert head["value"] == 55.55
    # full detail blob round-trips from the file the headline points to
    with open(_os.path.join(str(tmp_path), head["detail_file"])) as f:
        detail = _json.load(f)
    assert detail["scaling"]["walls_lo"] == full["scaling"]["walls_lo"]
    assert detail["llm_ops"] == full["llm_ops"]
