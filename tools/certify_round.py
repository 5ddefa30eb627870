"""Seeded-rotating per-round certification (VERDICT r5 item 6).

The driver's own gate has sampled the SAME 50 registry names since r3
(70/303 ever gated across five rounds). This tool widens the committed
correctness exposure builder-side: each round runs driver_sim over a
50-query sample drawn with seed = round number from the names the frozen
driver gate does NOT cover, so every round's committed artifact hash-covers
a fresh slice of the registry without relying on judge sampling.

Determinism: the sample is random.Random(seed) over a sorted pool — anyone
can re-derive the name list from (seed, the committed artifacts, registry)
and re-run the identical batch.

Pool construction (r8, VERDICT r7 ask 3): the sample draws FIRST from the
names that have never appeared in ANY committed gate or certification
(registry minus the union of every CORRECTNESS_r*.json and every prior
CERTIFICATION_r*.json's names) so the rotation eats the never-committed
complement down each round; only if that complement is smaller than n does
it top up from the rest of the non-frozen-gate pool. --legacy-pool restores
the pre-r8 behavior (complement of the frozen gate only) for reproducing
old rounds' name lists.

Run: python tools/certify_round.py ROUND [--sf-dir /root/testdata/sf0.01]
         [--gate CORRECTNESS_r05.json] [--n 50]
Writes CERTIFICATION_r{ROUND}.json at the repo root; exit 0 iff PASS=n FAIL=0.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _artifact_round(path: str) -> int | None:
    """Round number embedded in an artifact filename, or None. Unanchored on
    purpose (ADVICE r8): CERTIFICATION_r8_complement.json carries a suffix
    after the round, and CORRECTNESS uses zero-padded rounds (r08) — the old
    ``_r(\\d+)\\.json$`` anchor missed the former entirely and was never
    applied to the latter, so a same-round re-run could see a shrunken pool
    and break the seed-reproducibility guarantee."""
    import re

    m = re.search(r"_r(\d+)", os.path.basename(path))
    return int(m.group(1)) if m else None


def _artifact_names(path: str) -> set[str]:
    """The certified/gated names inside one artifact, tolerant of both shapes
    (CORRECTNESS = {name: result}; CERTIFICATION = {"names": [...]})."""
    try:
        doc = json.load(open(path))
    except (OSError, json.JSONDecodeError):
        return set()
    if isinstance(doc, dict) and "names" in doc:
        return set(doc.get("names") or [])
    return set(doc) if isinstance(doc, dict) else set()


def _coverage_artifacts() -> list[str]:
    import glob

    return sorted(
        glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
        + glob.glob(os.path.join(REPO, "CERTIFICATION_r*.json"))
    )


def committed_names(before_round: int) -> set[str]:
    """Every name present in a committed driver gate or certification from a
    PRIOR round at the repo root. The >= before_round skip applies to EVERY
    artifact family (ADVICE r8): this round's own (re)run — gate, cert, or
    complement cert — must not shrink its own pool."""
    covered: set[str] = set()
    for path in _coverage_artifacts():
        rnd = _artifact_round(path)
        if rnd is not None and rnd >= before_round:
            continue
        covered |= _artifact_names(path)
    return covered


def last_certified_round(before_round: int | None = None) -> dict[str, int]:
    """name -> newest round whose committed gate/cert contains it (the
    staleness ledger behind the ask-4 rotation report and the r10
    stale-weighted top-up). ``before_round`` excludes this round's own
    artifacts so a same-round re-run sees the identical ledger the first
    run saw (the rerun-stability guarantee of committed_names, applied to
    the ordering too)."""
    newest: dict[str, int] = {}
    for path in _coverage_artifacts():
        rnd = _artifact_round(path)
        if rnd is None:
            continue
        if before_round is not None and rnd >= before_round:
            continue
        for name in _artifact_names(path):
            if newest.get(name, -1) < rnd:
                newest[name] = rnd
    return newest


def staleness_report(round_no: int, this_round_names: list[str]) -> dict:
    """One-line rotation-health summary recorded in the artifact: how stale is
    the registry's LEAST-recently-certified name after this round's draw, and
    which names are the oldest. With the never-certified complement empty
    (r8), every name has a last-round; max staleness should stay ~small
    (every non-frozen-gate name reappears within a few rounds at n=75)."""
    import __spark_entry__ as e

    newest = last_certified_round()
    for name in this_round_names:
        newest[name] = round_no
    ages = {q: round_no - newest[q] for q in e.queries() if q in newest}
    never = sorted(q for q in e.queries() if q not in newest)
    max_age = max(ages.values(), default=0)
    oldest = sorted(q for q, a in ages.items() if a == max_age)
    return {
        "max_rounds_since_certified": max_age,
        "n_at_max": len(oldest),
        "oldest_names": oldest[:15],
        "never_certified": never,
    }


def pick_names(
    round_no: int,
    gate_path: str,
    n: int,
    legacy_pool: bool = False,
    stale_weighted: bool = True,
) -> list[str]:
    import __spark_entry__ as e

    all_names = sorted(e.queries())
    try:
        with open(gate_path) as f:
            gated = set(json.load(f))
    except (OSError, json.JSONDecodeError):
        gated = set()
    rng = random.Random(round_no)
    if legacy_pool:
        pool = [q for q in all_names if q not in gated]
        return sorted(rng.sample(pool, min(n, len(pool))))
    covered = committed_names(round_no) | gated
    complement = [q for q in all_names if q not in covered]
    if len(complement) >= n:
        return sorted(rng.sample(complement, n))
    # complement exhausted: take all of it, then top up from the rest of
    # the non-frozen-gate pool. Since r10 the top-up retires the STALE TAIL
    # first (VERDICT r9 ask 5: a uniform draw let 9 names go 7 rounds
    # uncertified — nothing forced the oldest names back in): candidates
    # are ordered by rounds-since-last-certified, oldest first, with the
    # seeded shuffle breaking ties only, so max staleness monotonically
    # falls while the draw stays re-derivable from (seed, committed
    # artifacts, registry). ``stale_weighted=False`` reproduces the
    # r8/r9-era uniform top-up for historical name lists.
    rest = [q for q in all_names if q not in gated and q not in complement]
    if not stale_weighted:
        top_up = rng.sample(rest, min(n - len(complement), len(rest)))
        return sorted(complement + top_up)
    rng.shuffle(rest)
    newest = last_certified_round(before_round=round_no)
    rest.sort(key=lambda q: newest.get(q, -1))  # stable: ties keep shuffle
    top_up = rest[: max(0, n - len(complement))]
    return sorted(complement + top_up)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("round", type=int)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--gate", default=os.path.join(REPO, "CORRECTNESS_r05.json"))
    ap.add_argument("--n", type=int, default=50)
    ap.add_argument("--batch", type=int, default=25)
    ap.add_argument("--legacy-pool", action="store_true",
                    help="pre-r8 pool (frozen-gate complement only), for "
                         "reproducing old rounds' name lists")
    ap.add_argument("--uniform-top-up", action="store_true",
                    help="r8/r9-era uniform top-up instead of the r10 "
                         "stale-weighted one, for reproducing those rounds' "
                         "name lists")
    args = ap.parse_args()

    names = pick_names(
        args.round, args.gate, args.n,
        legacy_pool=args.legacy_pool,
        stale_weighted=not args.uniform_top_up,
    )
    t0 = time.monotonic()
    report: dict[str, dict] = {}
    # fresh JVM per batch (same session-hygiene rationale as tools/sweep.py)
    for i in range(0, len(names), args.batch):
        batch = names[i : i + args.batch]
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "driver_sim.py"),
             args.sf_dir] + batch,
            capture_output=True,
            text=True,
            cwd=REPO,
        )
        from tools.sweep import parse_report

        got = parse_report(proc.stdout)
        for q in batch:
            report[q] = got.get(q, {"err": "batch died before this query"})
        done = sum(1 for r in report.values() if r.get("hash_match"))
        print(f"[certify_round] {done}/{len(report)} pass", file=sys.stderr)

    n_pass = sum(1 for r in report.values() if r.get("hash_match"))
    head = subprocess.run(
        ["git", "rev-parse", "HEAD"], capture_output=True, text=True, cwd=REPO
    ).stdout.strip()
    stale = staleness_report(args.round, names)
    artifact = {
        "round": args.round,
        "seed": args.round,
        "gate_excluded": os.path.basename(args.gate),
        "sf_dir": args.sf_dir,
        "git_head": head,
        "elapsed_sec": round(time.monotonic() - t0, 1),
        "pass": n_pass,
        "fail": len(names) - n_pass,
        "staleness": stale,
        "names": names,
        "report": report,
    }
    out = os.path.join(REPO, f"CERTIFICATION_r{args.round}.json")
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"PASS={n_pass} FAIL={len(names) - n_pass} -> {out}", file=sys.stderr)
    print(
        f"[staleness] max_rounds_since_certified="
        f"{stale['max_rounds_since_certified']} over {stale['n_at_max']} names; "
        f"never_certified={len(stale['never_certified'])}",
        file=sys.stderr,
    )
    return 0 if n_pass == len(names) else 1


if __name__ == "__main__":
    raise SystemExit(main())
