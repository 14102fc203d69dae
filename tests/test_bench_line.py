"""Pin the bench stdout evidence channel (VERDICT r6 task 1).

The external driver captures only the last ~2000 bytes of bench.py's
stdout; BENCH_r06.json came back "parsed": null because the final JSON
line outgrew that tail. These tests make the budget structural: the line
built from the CURRENT configured entry lists with worst-case-width
values must stay under 1500 bytes, so adding an entry that would re-break
the channel fails CI at add time.
"""

from __future__ import annotations

import json

import bench

BUDGET = 1500


def _worst_case_line() -> str:
    # 99.99 is the widest value a healthy entry can print at 2 dp without
    # the suite being >100 s per query (at which point the round has
    # bigger problems than the stdout budget); exponents print as e.g.
    # -0.12 / 1.88.
    line_timings = {n: 88.88 for n in bench.LINE_QUERIES}
    secondary = {n: 88.88 for n in bench.SECONDARY}
    for fit_label, probe_label, _ in bench.ANN_SPLIT:
        secondary[fit_label] = 88.88
        secondary[probe_label] = 88.88
    secondary["ann_coarse_fit"] = 88.88
    secondary["ann_books_fit"] = 88.88
    secondary["ann_opq_rotation_fit"] = 88.88
    scaling = {
        n: -1.88
        for n in bench.SCALING_TABLES
        if n not in bench.SCALING_DETAIL_ONLY
    }
    builds = {"lsh_pairs_build": 88.88}
    return bench.build_stdout_line(
        line_timings, 0.1, secondary, 0.01, scaling, builds, noise_p90=8.88
    )


def test_final_line_fits_driver_tail_with_headroom():
    line = _worst_case_line()
    assert len(line) <= BUDGET, (
        f"bench stdout line is {len(line)} bytes > {BUDGET}: rotate an entry "
        f"out of LINE_QUERIES (full history stays in BENCH_DETAIL.json)"
    )


def test_calibration_entries_configured_and_off_the_line():
    """The r11 host-drift calibration entries exist, are fixed-input by
    construction (their labels name the frozen input), and stay OFF the
    stdout line so the byte budget is untouched — they live in
    BENCH_DETAIL's "calibration" block only."""
    assert len(bench.CALIBRATION) >= 2
    assert set(bench.CALIBRATION).isdisjoint(bench.LINE_QUERIES)
    assert set(bench.CALIBRATION).isdisjoint(bench.HEADLINE)
    assert set(bench.CALIBRATION).isdisjoint(bench.SECONDARY)
    line = _worst_case_line()
    for name in bench.CALIBRATION:
        assert name not in line


def test_final_line_is_one_parseable_json_object():
    line = _worst_case_line()
    assert "\n" not in line
    obj = json.loads(line)
    for key in ("metric", "value", "unit", "queries", "sf", "builds",
                "secondary", "secondary_sf", "scaling", "noise_p90"):
        assert key in obj
    assert obj["unit"] == "sec"
    assert abs(obj["value"] - sum(obj["queries"].values())) < 0.5


def test_line_queries_are_measured_headline_entries():
    assert set(bench.LINE_QUERIES) <= set(bench.HEADLINE)
    assert len(set(bench.LINE_QUERIES)) == len(bench.LINE_QUERIES)


def test_all_bench_entries_are_registered_queries():
    from vmhub_data_pipeline_spark import queries as catalog

    qs = catalog.queries()
    for name in bench.HEADLINE + bench.SECONDARY:
        assert name in qs, name
    # pseudo-entries with bench-local runners: the capped-jaccard
    # production config, the resident-index IVF-PQ probe (runs
    # ann_ivfpq_topk against a prewarmed per-sf_dir index), and the
    # boilerplate-HEAVY capped-LSH probe (the registered twin uses a
    # fixed 150-doc slice; the probe scales it with the corpus)
    for name in bench.SCALING_TABLES:
        if name not in (
            "jaccard_capped_100", "ann_ivfpq_probe", "lsh_capped_boilerplate"
        ):
            assert name in qs, name


def test_drift_normalized_block_math_and_guards():
    """r12 (VERDICT r11 task 7): the drift normalizer divides each
    entry's raw round-over-round ratio by the session's calibration
    ratio, and degrades to empty when there is no reference series."""
    calib = {"calib_jvm_compute": 0.28, "calib_scan_agg_sf0001": 0.55}
    prev = {
        "calibration": {"calib_jvm_compute": 0.224, "calib_scan_agg_sf0001": 0.436},
        "headline_all": {"q1_pricing_summary": 1.0, "daily_revenue": 0.5},
    }
    timings = {"q1_pricing_summary": 1.25, "daily_revenue": 0.5, "brand_new": 0.3}
    drift, ratio = bench.drift_normalized_block(calib, timings, prev)
    # calibration ratios: 1.25 and ~1.261 -> median is the upper of two
    assert ratio == round(sorted([0.28 / 0.224, 0.55 / 0.436])[1], 3)
    # q1 moved exactly with calibration -> normalized ~1.0
    assert abs(drift["q1_pricing_summary"] - round((1.25 / 1.0) / ratio, 3)) < 0.01
    # an entry with no previous measurement is simply absent
    assert "brand_new" not in drift
    # no reference series -> empty block, not a crash
    assert bench.drift_normalized_block(calib, timings, None) == ({}, None)
    assert bench.drift_normalized_block(calib, timings, {}) == ({}, None)
