"""The canary-normalized regression gate in bench.py (r8 verdict item
1: a 9.8× per-query regression shipped inside an "empty regressions
block" because raw wall times drowned in the ±25% whole-VM noise
band). Pure-Python tests — no Spark session — over the gate's three
pieces: the canary ratio, the normalized flag rule, and the compact
driver line's 2000-char stdout cap."""

import json

import bench


# ---------------------------------------------------------------------------
# _normalized_regressions — the vs-self rule
# ---------------------------------------------------------------------------


def test_injected_slowdown_is_flagged():
    """A genuine 2× slowdown on a steady machine (canary ratio 1.0)
    must be flagged — this is the r8 entity_match_pairs shape (0.33 →
    3.23 s) that the old 3×-raw rule let through only because the
    sub-second floor exempted it; the absolute-delta floor (0.5 s)
    keeps it in scope."""
    prior = {"q_fast": 0.33, "q_other": 1.0}
    now = {"q_fast": 3.23, "q_other": 1.05}
    flagged = bench._normalized_regressions(now, prior, canary_ratio=1.0)
    assert set(flagged) == {"q_fast"}
    assert flagged["q_fast"]["normalized_ratio"] > 9


def test_uniform_machine_slowdown_not_flagged():
    """When the whole VM runs 2× slower (canary ratio 2.0), raw times
    double everywhere — the normalized gate must stay EMPTY (this is
    the r8 close-of-round artifact: +16% across 148 queries, warm
    slower than cold, all noise)."""
    prior = {"a": 1.0, "b": 4.0, "c": 0.8}
    now = {k: v * 2.0 for k, v in prior.items()}
    assert bench._normalized_regressions(now, prior, canary_ratio=2.0) == {}


def test_machine_speedup_does_not_hide_regression():
    """A 2× FASTER machine halves every raw time — a query that held
    its raw time actually regressed 2× in plan terms and must flag."""
    prior = {"a": 2.0, "b": 2.0}
    now = {"a": 1.0, "b": 2.0}  # b should have dropped to ~1.0 too
    flagged = bench._normalized_regressions(now, prior, canary_ratio=0.5)
    assert set(flagged) == {"b"}


def test_subsecond_jitter_not_flagged():
    """1.5× of a 0.1 s query is scheduler jitter: the absolute-delta
    floor (0.5 s) keeps it out."""
    assert (
        bench._normalized_regressions({"q": 0.25}, {"q": 0.1}, 1.0) == {}
    )


def test_known_slow_not_exempt_from_vs_self():
    """KNOWN_SLOW members are exempt from the vs-suite-median rule but
    NEVER from the vs-self rule."""
    name = sorted(bench.KNOWN_SLOW)[0]
    flagged = bench._normalized_regressions({name: 9.0}, {name: 3.0}, 1.0)
    assert name in flagged


# ---------------------------------------------------------------------------
# _machine_ratio — the robust suite-median estimator the gate uses
# ---------------------------------------------------------------------------


def test_machine_ratio_is_median_and_outlier_proof():
    """One query regressing 10× (the thing the gate must FLAG) must
    not drag the machine estimate — median of ratios."""
    prior = {f"q{i}": 1.0 for i in range(20)}
    now = {f"q{i}": 0.9 for i in range(20)}
    now["q0"] = 10.0  # the real regression
    assert bench._machine_ratio(now, prior) == 0.9


def test_machine_ratio_ignores_subfloor_priors_and_small_overlap():
    prior = {"a": 0.05, "b": 0.01}  # all under the 0.2 s floor
    assert bench._machine_ratio({"a": 1.0, "b": 1.0}, prior) is None
    assert bench._machine_ratio({}, {}) is None


def test_noisy_prior_canary_pair_does_not_mass_flag():
    """The r9 live lesson: the prior round recorded the canary pair
    inside a VM slow window (pricing_summary 1.95 s), so the PAIR ratio
    said 'machine 2× faster' while the suite's true ratio was ~0.9 —
    normalizing by the pair would flag dozens of held-raw-time queries.
    The suite-median estimator must keep the gate quiet on that shape
    and still flag the one genuine regression."""
    prior = {f"q{i}": 1.0 for i in range(30)}
    prior.update({"pricing_summary": 1.95, "asof_price": 0.56})
    now = {f"q{i}": 0.95 for i in range(30)}
    now.update({"pricing_summary": 0.64, "asof_price": 0.38})
    now["q7"] = 3.0  # genuine 3x regression
    mr = bench._machine_ratio(now, prior)
    flagged = bench._normalized_regressions(now, prior, mr)
    assert set(flagged) == {"q7"}


# ---------------------------------------------------------------------------
# _canary_ratio
# ---------------------------------------------------------------------------


def test_canary_ratio_mean_of_brackets_vs_prior():
    prior = {"pricing_summary": 1.0, "asof_price": 1.0}
    first = {"pricing_summary": [1.5], "asof_price": [1.5]}
    last = {"pricing_summary": [2.5], "asof_price": [2.5]}
    blk = bench._canary_ratio(prior, first, last)
    assert blk["ratio_vs_prior"] == 2.0  # mean(1.5, 2.5) * 2 / 2
    assert blk["drift_within_run"] == round(5.0 / 3.0, 3)


def test_canary_ratio_defaults_to_one_without_prior():
    blk = bench._canary_ratio({}, {"pricing_summary": [1.0]}, {})
    assert blk["ratio_vs_prior"] == 1.0


def test_canary_ratio_drops_cold_first_run(  # r10 verdict item 2
):
    """The cold-first-run shape: a leg's run 1 is structurally cold
    (session start / post-recycle JIT). The pair ratio must come from
    the WARM median (run 1 dropped); the cold sample stays as
    telemetry in first_cold_run and in ratio_vs_prior_cold."""
    prior = {"pricing_summary": 0.642, "asof_price": 0.433}
    # run 1 is 2.5-5x the warm tail — the r10 close's recorded shape
    first = {
        "pricing_summary": [1.661, 0.71, 0.68],
        "asof_price": [1.769, 0.53, 0.50],
    }
    last = {
        "pricing_summary": [0.60, 0.48, 0.46],
        "asof_price": [0.45, 0.35, 0.34],
    }
    blk = bench._canary_ratio(prior, first, last)
    # warm medians: first 0.695/0.515, last 0.47/0.345
    assert blk["first"] == {"pricing_summary": 0.695, "asof_price": 0.515}
    assert blk["first_cold_run"] == {
        "pricing_summary": 1.661, "asof_price": 1.769,
    }
    # warm ratio ~0.94 — the cold estimator would say ~1.1+; the 2x
    # cold bias must NOT reach the ratio the gate normalizes by
    assert blk["ratio_vs_prior"] < 1.0
    assert blk["ratio_vs_prior_cold"] > blk["ratio_vs_prior"]
    # with the warm pair, the r10 disagreement alert stays quiet
    canary = dict(blk)
    bench._finalize_canary(canary, 1.029, {"q": 1.0}, {"q": 1.0})
    assert canary["estimator_disagreement"] < 1.3
    assert canary["estimator_disagreement_flag"] is False


def test_disagreement_attributed_to_drift_not_flagged():
    """The full r10 close shape: the ENTIRE first leg ran inside a
    cold/slow VM window (all samples ~1.66 s), so no sample-dropping
    can warm it — but drift_within_run 0.24 says the machine changed
    speed mid-run, so the pair-vs-median disagreement IS the drift.
    It must be attributed and de-escalated, not left as an unresolved
    alert; a disagreement on a STEADY machine (the broad non-uniform
    regression signature) must still flag."""
    prior = {"pricing_summary": 0.642, "asof_price": 0.433}
    first = {
        "pricing_summary": [1.66, 1.661, 1.67],
        "asof_price": [1.77, 1.769, 1.76],
    }
    last = {
        "pricing_summary": [0.48, 0.474, 0.47],
        "asof_price": [0.35, 0.345, 0.34],
    }
    canary = bench._canary_ratio(prior, first, last)
    assert canary["drift_within_run"] < 0.75  # machine sped up mid-run
    bench._finalize_canary(canary, 1.029, {"q": 1.0}, {"q": 1.0})
    assert canary["estimator_disagreement"] > 1.3
    assert canary["disagreement_attributed_to_drift"] is True
    assert canary["estimator_disagreement_flag"] is False
    # steady machine, same disagreement: the flag must fire
    steady = {"ratio_vs_prior": 1.0, "drift_within_run": 1.0}
    bench._finalize_canary(steady, 1.6, {"q": 1.0}, {"q": 1.0})
    assert steady["estimator_disagreement_flag"] is True
    assert steady["disagreement_attributed_to_drift"] is False


# ---------------------------------------------------------------------------
# _compact_line — the driver keeps only the last 2000 stdout chars
# ---------------------------------------------------------------------------


def _fake_out(n_queries=300, n_regs=40):
    queries = {f"query_with_a_long_name_{i:03d}": i * 0.01 for i in range(n_queries)}
    regs = {
        f"query_with_a_long_name_{i:03d}": {
            "sec": 2.0,
            "normalized_sec": 1.9,
            "prior_sec": 1.0,
            "normalized_ratio": 1.9,
        }
        for i in range(n_regs)
    }
    return {
        "metric": "headline_queries_total_sec",
        "value": 123.456,
        "unit": "sec",
        "sf": 0.1,
        "runs": 3,
        "queries": queries,
        "canary": {
            "ratio_vs_prior": 1.05,
            "first": {"pricing_summary": 0.3, "asof_price": 0.5},
            "last": {"pricing_summary": 0.31, "asof_price": 0.52},
            "drift_within_run": 1.02,
        },
        "normalized_regressions": regs,
        "scale_probe": {
            "queries": {f"p{i}": {"vs_expected": 0.1 * i} for i in range(40)}
        },
        "scale_probe_100x": {"queries": {"q": {"vs_expected": 0.21}}},
        "pipeline_e2e_batch_sec": 12.3,
        "pipeline_e2e_batch_sec_warm": 11.9,
        "pipeline_e2e_streaming_sec": 15.0,
        "pipeline_e2e_streaming_sec_warm": 14.1,
        "errors": {},
        "full_artifact": "BENCH_full_r09.json",
    }


def test_compact_line_fits_driver_cap_and_parses():
    line = bench._compact_line(_fake_out())
    assert len(line) <= 1900
    doc = json.loads(line)
    assert doc["value"] == 123.456
    assert doc["n_queries"] == 300
    assert doc["canary"]["ratio_vs_prior"] == 1.05
    assert doc["n_regressions"] == 40
    assert doc["full"] == "BENCH_full_r09.json"
    assert doc["scale_probe_100x_worst_vs_expected"] == 0.21
    # the top-10 slowest are the ones worth eyeballing in the tail
    assert len(doc["queries"]) <= 10
    slowest = max(_fake_out()["queries"].items(), key=lambda kv: kv[1])[0]
    assert slowest in doc["queries"]


def test_compact_line_degrades_until_it_fits():
    out = _fake_out(n_queries=300, n_regs=300)
    line = bench._compact_line(out, max_len=900)
    assert len(line) <= 900
    assert json.loads(line)["n_regressions"] == 300


# ---------------------------------------------------------------------------
# prior-round baseline discovery
# ---------------------------------------------------------------------------


def test_prior_round_prefers_full_map_on_round_tie(tmp_path):
    """The driver's BENCH_r file now carries only a compact top-10 map;
    the complete baseline lives in BENCH_full of the same round and
    must win key collisions without dropping compact-only keys."""
    (tmp_path / "BENCH_r07.json").write_text(
        json.dumps({"parsed": {"queries": {"a": 9.0, "only_compact": 1.0}}})
    )
    (tmp_path / "BENCH_full_r07.json").write_text(
        json.dumps({"queries": {"a": 2.0, "b": 3.0}})
    )
    prior = bench._prior_round_timings(str(tmp_path))
    assert prior == {"a": 2.0, "b": 3.0, "only_compact": 1.0}


def test_finalize_canary_caps_ratio_band():
    """r9 ADVICE: the correction ratio is capped to [0.5, 2.0] — an
    estimator saying 'machine 5x faster' must not let the gate divide
    every regression by 5."""
    import bench as B

    canary = {"ratio_vs_prior": 1.0}
    used = B._finalize_canary(canary, 0.2, {"q": 1.0}, {"q": 1.0})
    assert used == 0.5 and canary["ratio_capped"] is True
    canary = {"ratio_vs_prior": 1.0}
    used = B._finalize_canary(canary, 5.0, {"q": 1.0}, {"q": 1.0})
    assert used == 2.0 and canary["ratio_capped"] is True
    canary = {"ratio_vs_prior": 1.0}
    used = B._finalize_canary(canary, 1.1, {"q": 1.0}, {"q": 1.0})
    assert used == 1.1 and canary["ratio_capped"] is False


def test_finalize_canary_flags_estimator_disagreement():
    """The broad-regression signature: suite median shifted (many
    queries slower) while the plan-pinned pair held — the two
    estimators disagreeing >1.3x must raise the flag."""
    import bench as B

    canary = {"ratio_vs_prior": 1.0}
    B._finalize_canary(canary, 1.6, {"q": 1.0}, {"q": 1.0})
    assert canary["estimator_disagreement_flag"] is True
    assert canary["estimator_disagreement"] == 1.6
    canary = {"ratio_vs_prior": 1.0}
    B._finalize_canary(canary, 1.1, {"q": 1.0}, {"q": 1.0})
    assert canary["estimator_disagreement_flag"] is False


def test_finalize_canary_reports_prior_coverage():
    """r9 ADVICE: when only a compact top-10 prior map survives, the
    gate must SAY it covers 10 of 90 — not report a clean run."""
    import bench as B

    timings = {f"q{i}": 1.0 for i in range(90)}
    prior = {f"q{i}": 1.0 for i in range(10)}
    canary = {"ratio_vs_prior": 1.0}
    B._finalize_canary(canary, 1.0, timings, prior)
    assert canary["prior_coverage"] == {"n_prior": 10, "n_timed": 90}
    assert canary["prior_coverage_low"] is True
    canary = {"ratio_vs_prior": 1.0}
    B._finalize_canary(canary, 1.0, timings, dict(timings))
    assert canary["prior_coverage_low"] is False


def test_injected_broad_regression_division_of_labor():
    """The ADVICE failure shape end-to-end, both halves:

    (a) HALF the suite regresses 3x — the ratio-median lands between
    the modes (2.0) and self-normalization absorbs the per-query
    flags; the DISAGREEMENT alert (pair holds at 1.0, median says
    2.0) is what catches this shape.

    (b) the WHOLE suite regresses 4x — without the cap the estimator
    says 'machine 4x slower' and normalizes everything clean; the CAP
    at 2.0 keeps a 2x normalized residual, which flags every query."""
    import bench as B

    # (a) half regressed: disagreement alert, not per-query flags
    prior = {f"q{i}": 2.0 for i in range(20)}
    timings = {f"q{i}": (6.0 if i < 10 else 2.0) for i in range(20)}
    canary = {"ratio_vs_prior": 1.0}
    used = B._finalize_canary(
        canary, B._machine_ratio(timings, prior), timings, prior
    )
    assert canary["estimator_disagreement_flag"] is True
    # (b) uniform 4x: the cap forces the per-query flags through
    timings = {f"q{i}": 8.0 for i in range(20)}
    canary = {"ratio_vs_prior": 1.0}
    used = B._finalize_canary(
        canary, B._machine_ratio(timings, prior), timings, prior
    )
    assert used == 2.0 and canary["ratio_capped"] is True
    flagged = B._normalized_regressions(timings, prior, used)
    assert set(flagged) == set(timings), flagged


def test_close_round_regenerates_notes(tmp_path):
    """tools/close_round.py (r9 verdict item 8): the ROUND{N}.md
    autogen block is rewritten from the FINAL artifacts — numbers in
    notes cannot drift from the recording — and the exit code carries
    the strict-gate condition."""
    import json
    import subprocess
    import sys

    bench = {
        "value": 12.3, "sf": 0.1, "runs": 3,
        "queries": {"a": 1.0, "b": 2.0},
        "canary": {"ratio_used_for_gate": 1.0,
                   "machine_ratio_suite_median": 1.0,
                   "ratio_vs_prior": 1.0, "ratio_capped": False,
                   "estimator_disagreement": 1.0,
                   "prior_coverage": {"n_prior": 2, "n_timed": 2}},
        "normalized_regressions": {},
        "full_artifact": "BENCH_full_r07.json",
        "scale_probe": {"queries": {
            "a": {"vs_expected": 0.5},
            "a__cold": {"sec": 9.9, "warm": False},
        }},
    }
    (tmp_path / "BENCH_full_r07.json").write_text(json.dumps(bench))
    (tmp_path / "CORRECTNESS_full_r07_sf0.01.json").write_text(
        json.dumps({"matched": 5, "total": 5, "results": {}})
    )
    r = subprocess.run(
        [sys.executable, "tools/close_round.py", "--round", "7",
         "--repo", str(tmp_path)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    text = (tmp_path / "ROUND7.md").read_text()
    assert "12.3 s over 2 queries" in text
    assert "sf0.01: 5/5" in text
    assert "cold rows: 1" in text
    # idempotent re-run with a manual preamble preserved
    (tmp_path / "ROUND7.md").write_text("# my prose\n\n" + text)
    r2 = subprocess.run(
        [sys.executable, "tools/close_round.py", "--round", "7",
         "--repo", str(tmp_path)],
        capture_output=True, text=True,
    )
    assert r2.returncode == 0
    t2 = (tmp_path / "ROUND7.md").read_text()
    assert t2.count("12.3 s over 2 queries") == 1 and "# my prose" in t2
    # a regression in the final artifact fails the close
    bench["normalized_regressions"] = {
        "a": {"sec": 9, "normalized_sec": 9, "prior_sec": 1,
              "normalized_ratio": 9.0}
    }
    (tmp_path / "BENCH_full_r07.json").write_text(json.dumps(bench))
    r3 = subprocess.run(
        [sys.executable, "tools/close_round.py", "--round", "7",
         "--repo", str(tmp_path)],
        capture_output=True, text=True,
    )
    assert r3.returncode == 3


def test_flag_retry_contract():
    """The r11 flag-retry pass: a first-pass flag whose retry (a
    different time window) lands back at baseline must clear; one
    whose retry reproduces must stay flagged. The pass substitutes the
    retry median into the timings and recomputes — this pins the
    recompute semantics it relies on."""
    prior = {"q_noise": 1.0, "q_real": 1.0, "q_ok": 1.0}
    timings = {"q_noise": 3.0, "q_real": 3.0, "q_ok": 1.0}
    first = bench._normalized_regressions(timings, prior, 1.0)
    assert set(first) == {"q_noise", "q_real"}
    # retry: q_noise re-measures at baseline, q_real reproduces
    timings["q_noise"] = 1.05
    timings["q_real"] = 2.9
    second = bench._normalized_regressions(timings, prior, 1.0)
    assert set(second) == {"q_real"}


# ---------------------------------------------------------------------------
# _flag_retry_pass — r11 verdict item 4 (the retry machinery had never
# executed successfully; exercised here end-to-end with a synthetic flag)
# and r11 ADVICE bench.py:1420 (retry medians must not contaminate the
# headline queries map / next round's baseline)
# ---------------------------------------------------------------------------


def test_flag_retry_pass_clears_synthetic_flag():
    """Synthetic flag injection: q_noise's first pass is 3x its prior
    (a VM slow window); the retry in a different time window lands at
    baseline. The pass must (a) record both values in flag_retries,
    (b) clear the flag in the recompute over `effective`, and (c)
    leave the first-pass median in `timings` so the headline map and
    next round's baseline stay single-window."""
    prior = {"q_noise": 1.0, "q_real": 1.0, "q_ok": 1.0}
    timings = {"q_noise": 3.0, "q_real": 3.0, "q_ok": 1.0}
    first = bench._normalized_regressions(timings, prior, 1.0)
    assert set(first) == {"q_noise", "q_real"}
    retries = {"q_noise": 1.05, "q_real": 2.9}
    errors = {}
    flag_retries, effective = bench._flag_retry_pass(
        first, timings, retries.__getitem__, errors
    )
    assert flag_retries == {
        "q_noise": {"first_pass_sec": 3.0, "retry_sec": 1.05},
        "q_real": {"first_pass_sec": 3.0, "retry_sec": 2.9},
    }
    assert errors == {}
    # headline map untouched — first-pass medians survive
    assert timings == {"q_noise": 3.0, "q_real": 3.0, "q_ok": 1.0}
    # recompute over effective: noise cleared, real regression stays
    second = bench._normalized_regressions(effective, prior, 1.0)
    assert set(second) == {"q_real"}


def test_flag_retry_pass_records_errors_and_keeps_flag():
    """A retry that dies (e.g. stopped SparkContext — the r11 failure
    mode) must record the error and leave the first-pass timing in
    effect so the flag is not silently dropped."""
    prior = {"q_bad": 1.0}
    timings = {"q_bad": 3.0}
    first = bench._normalized_regressions(timings, prior, 1.0)

    def boom(name):
        raise RuntimeError("stopped SparkContext")

    errors = {}
    flag_retries, effective = bench._flag_retry_pass(
        first, timings, boom, errors
    )
    assert flag_retries == {}
    assert "flag_retry:q_bad" in errors
    assert set(bench._normalized_regressions(effective, prior, 1.0)) == {
        "q_bad"
    }


# ---------------------------------------------------------------------------
# sf10 carry-forward — r11 verdict item 2 (the r11 carry reused the
# builder's 100x queries but dropped the errors field, shipping a dead
# probe as 12 clean rows)
# ---------------------------------------------------------------------------


def test_embed_probe_errors_stamps_block():
    block = {"queries": {"a": {"sec": 1.0}}}
    errors = {
        "scale_probe_100x:b": "OutOfMemoryError: Java heap space",
        "scale_probe_100x:c__cold": "IllegalStateException: stopped",
        "canary_last:pricing_summary": "unrelated",
    }
    bench._embed_probe_errors(block, errors)
    assert block["errors"] == {
        "b": "OutOfMemoryError: Java heap space",
        "c__cold": "IllegalStateException: stopped",
    }
    assert block["incomplete"] == ["b", "c__cold"]
    # clean run: no errors key at all
    clean = {"queries": {"a": {"sec": 1.0}}}
    bench._embed_probe_errors(clean, {"other:x": "y"})
    assert "errors" not in clean and "incomplete" not in clean


def test_carry_forward_preserves_embedded_errors(tmp_path):
    """A carried block with errors must still show them (r12 style:
    errors embedded in the block by _embed_probe_errors)."""
    doc = {
        "scale_probe_100x": {
            "queries": {"a": {"sec": 1.0}},
            "errors": {"b": "OutOfMemoryError"},
            "incomplete": ["b"],
        }
    }
    (tmp_path / "BENCH_full_r09.json").write_text(json.dumps(doc))
    out = bench._carry_forward_100x(str(tmp_path))
    assert out["reused_from_round"] == 9
    assert out["errors"] == {"b": "OutOfMemoryError"}
    assert out["incomplete"] == ["b"]


def test_carry_forward_reconstructs_top_level_errors(tmp_path):
    """Pre-r12 artifacts kept probe failures only in the document's
    top-level errors map — the carry must reconstruct them instead of
    shipping a silently-clean block (the exact r11 failure)."""
    doc = {
        "scale_probe_100x": {"queries": {"a": {"sec": 1.0}}},
        "errors": {
            "scale_probe_100x:streaming_novelty_incremental": "OOM",
            "flag_retry:x": "unrelated",
        },
    }
    (tmp_path / "BENCH_full_r11.json").write_text(json.dumps(doc))
    out = bench._carry_forward_100x(str(tmp_path))
    assert out["reused_from_round"] == 11
    assert out["errors"] == {"streaming_novelty_incremental": "OOM"}
    assert out["incomplete"] == ["streaming_novelty_incremental"]
    # newest round wins; a clean newest block carries no error keys
    clean = {"scale_probe_100x": {"queries": {"a": {"sec": 0.9}}}}
    (tmp_path / "BENCH_full_r12.json").write_text(json.dumps(clean))
    out2 = bench._carry_forward_100x(str(tmp_path))
    assert out2["reused_from_round"] == 12
    assert "errors" not in out2 and "incomplete" not in out2


def test_canary_ratio_no_prior_shape_matches_main_branch():
    """r11 ADVICE bench.py:792: the no-prior early return must emit
    the same rounded warm-median scalar shape as the main branch, not
    raw sample lists."""
    blk = bench._canary_ratio(
        {},
        {"pricing_summary": [1.661, 0.71, 0.68]},
        {"pricing_summary": [0.60, 0.48, 0.46]},
    )
    assert blk["ratio_vs_prior"] == 1.0
    assert blk["first"] == {"pricing_summary": round(0.695, 3)}
    assert blk["last"] == {"pricing_summary": 0.47}
    assert blk["first_cold_run"] == {"pricing_summary": 1.661}
    assert blk["last_cold_run"] == {"pricing_summary": 0.6}
    assert blk["drift_within_run"] is None
