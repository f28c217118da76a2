"""Round-close note regeneration (r9 verdict item 8: ROUND{N}.md's
headline numbers drifted from the final BENCH_full after a late
refresh — notes said one total, the artifact another).

Reads the CURRENT round's final artifacts — ``BENCH_full_r{N}.json``
and ``CORRECTNESS_full_r{N}_sf*.json`` — and rewrites the AUTOGEN block
in ``ROUND{N}.md`` from them, so the prose can never disagree with the
recording. Run it as the LAST step of a round close (after the final
bench/correctness refresh); re-running is idempotent.

Exit codes: 0 clean; 2 artifacts missing; 3 the final BENCH_full
carries normalized regressions (the strict-gate condition — a close on
top of unexplained flags should fail here too, not only in bench).

Usage: python tools/close_round.py [--round N] [--repo DIR]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

BEGIN = "<!-- AUTOGEN:CLOSE BEGIN (tools/close_round.py) -->"
END = "<!-- AUTOGEN:CLOSE END -->"


def current_round(repo: str) -> int:
    """N = newest driver-recorded round + 1 (the same rule bench.py
    uses to name BENCH_full_r{N}): the driver writes BENCH_r{N}.json
    AFTER our in-round artifacts exist."""
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(repo, "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", p))
    ]
    return max(rounds, default=0) + 1


def load_artifacts(repo: str, n: int):
    bench_path = os.path.join(repo, f"BENCH_full_r{n:02d}.json")
    bench = None
    if os.path.isfile(bench_path):
        with open(bench_path) as f:
            bench = json.load(f)
    corr = {}
    for p in sorted(
        glob.glob(os.path.join(repo, f"CORRECTNESS_full_r{n:02d}_sf*.json"))
    ) + sorted(
        glob.glob(os.path.join(repo, f"CORRECTNESS_full_r{n}_sf*.json"))
    ):
        m = re.search(r"_sf([0-9.]+)\.json$", p)
        if not m:
            continue
        with open(p) as f:
            doc = json.load(f)
        # tools/check_correctness.py --json shape:
        # {"matched": N, "total": M, "results": {q: {...,"status"}}, ...}
        corr[m.group(1)] = (
            int(doc.get("matched", 0)),
            int(doc.get("total", len(doc.get("results") or {}))),
        )
    return bench, corr


def render_block(n: int, bench, corr) -> str:
    lines = [BEGIN, ""]
    lines.append(
        f"### Round-{n} close numbers (regenerated from the final "
        "artifacts — do not hand-edit)"
    )
    lines.append("")
    if corr:
        parts = ", ".join(
            f"sf{sf}: {ok}/{tot}" for sf, (ok, tot) in sorted(corr.items())
        )
        lines.append(f"- Correctness (full suite): {parts}")
    if bench:
        qs = bench.get("queries") or {}
        lines.append(
            f"- Bench total: {bench.get('value')} s over {len(qs)} queries "
            f"at sf{bench.get('sf')} (runs={bench.get('runs')}, artifact "
            f"{bench.get('full_artifact')})"
        )
        canary = bench.get("canary") or {}
        lines.append(
            "- Machine-speed gate: ratio_used="
            f"{canary.get('ratio_used_for_gate')} "
            f"(suite-median {canary.get('machine_ratio_suite_median')}, "
            f"pair {canary.get('ratio_vs_prior')}, capped="
            f"{canary.get('ratio_capped')}, disagreement "
            f"{canary.get('estimator_disagreement')}), prior coverage "
            f"{(canary.get('prior_coverage') or {}).get('n_prior')}/"
            f"{(canary.get('prior_coverage') or {}).get('n_timed')}"
        )
        regs = bench.get("normalized_regressions") or {}
        if regs:
            worst = sorted(
                regs.items(), key=lambda kv: -kv[1]["normalized_ratio"]
            )
            lines.append(
                f"- NORMALIZED REGRESSIONS ({len(regs)}): "
                + ", ".join(
                    f"{k} {v['normalized_ratio']}x" for k, v in worst[:6]
                )
            )
        else:
            lines.append("- Normalized regressions: none")
        for key in ("scale_probe", "scale_probe_100x"):
            blk = bench.get(key) or {}
            rows = blk.get("queries") or {}
            vals = [
                (q, r.get("vs_expected"))
                for q, r in rows.items()
                if isinstance(r, dict)
                and isinstance(r.get("vs_expected"), (int, float))
            ]
            if vals:
                worst_q, worst_v = max(vals, key=lambda t: t[1])
                cold = [q for q in rows if q.endswith("__cold")]
                extra = f", cold rows: {len(cold)}" if cold else ""
                # r11 verdict item 2: a probe block that failed rows
                # must say so in the close note, not just the artifact
                inc = blk.get("incomplete") or []
                if inc:
                    extra += (
                        f", INCOMPLETE — {len(inc)} planned rows "
                        f"failed: {inc[:4]}"
                    )
                lines.append(
                    f"- {key}: {len(vals)} rows, worst vs_expected "
                    f"{worst_v} ({worst_q}){extra}"
                )
        errs = bench.get("errors") or {}
        if errs:
            lines.append(f"- Bench errors: {len(errs)} — {sorted(errs)[:4]}")
    lines += ["", END]
    return "\n".join(lines)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=None)
    ap.add_argument(
        "--repo",
        default=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    args = ap.parse_args()
    n = args.round or current_round(args.repo)
    bench, corr = load_artifacts(args.repo, n)
    if bench is None and not corr:
        print(
            f"close_round: no BENCH_full_r{n:02d}.json or correctness "
            "artifacts found — run bench/check_correctness first",
            file=sys.stderr,
        )
        return 2
    block = render_block(n, bench, corr)
    path = os.path.join(args.repo, f"ROUND{n}.md")
    if os.path.isfile(path):
        with open(path) as f:
            text = f.read()
        if BEGIN in text and END in text:
            pre, rest = text.split(BEGIN, 1)
            _, post = rest.split(END, 1)
            text = pre + block + post
        else:
            text = text.rstrip() + "\n\n" + block + "\n"
    else:
        text = f"# Round {n}\n\n{block}\n"
    with open(path, "w") as f:
        f.write(text)
    print(f"close_round: wrote {path}")
    if bench and (bench.get("normalized_regressions") or {}):
        print(
            "close_round: final BENCH_full carries normalized "
            "regressions — root-cause or rebaseline before closing",
            file=sys.stderr,
        )
        return 3
    return 0


if __name__ == "__main__":
    sys.exit(main())
