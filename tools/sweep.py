"""Run the ENTIRE registry through driver_sim in fresh-process batches and
aggregate one PASS/FAIL report — the certification command for any sf_dir,
including scaled dirs from tools/make_scaled_dir.py.

Batching matters for two reasons measured during round-2/3 sweeps:
- session hygiene: 300 queries in one JVM accumulate broadcasts/persists until
  late queries die in spurious broadcast OOMs (driver_sim clears cache per
  query, but a fresh JVM per ~40 queries bounds the blast radius of any leak);
- a JVM-fatal failure (heap OOM at scaled dirs) kills only its batch, and the
  report names exactly which queries never ran.

Queries whose DuckDB oracle is deliberately quadratic (declared brute-force
baselines and the ER family's ground-truth all-pairs) are routed to
``--heavy-dir`` (default: the main dir) so the main dir can be ~sf1 while the
heavy oracles run at a tractable scale.

Run: python tools/sweep.py SF_DIR [--heavy-dir DIR] [--mem 16g] [--batch 40]
          [--out /tmp/sweep_out]
Exit 0 iff every query ran and hash-matched.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: Oracles that replay ground truth quadratically (declared exact baselines:
#: the engine side is guarded/blocked, the ORACLE is the all-pairs spec).
HEAVY_ORACLE = [
    "er_blocking_quality",
    "er_entity_clusters",
    "g_kcore_peel",  # oracle's recursive closure spills unboundedly at ~sf1
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    # flow_species_load and j_dbscan_grid were routed here in r3 (replication
    # collided the c%500 symbol space / stacked point density in one unit
    # square, blowing up the ORACLE); r4 made both worlds replica-invariant —
    # symbol space and DBSCAN coordinates now compose the 10M replica block —
    # so they certify at the scaled dir proper.
]


def parse_report(raw: str) -> dict:
    """Extract the LAST top-level JSON object from a driver_sim stdout capture.

    The JVM occasionally writes gc/alloc warnings to STDOUT (e.g.
    "[956s][warning][gc,alloc] ... GCLocker ..."), before OR after the report
    and possibly containing braces. driver_sim prints its multi-line report
    (json.dumps indent=1) LAST, so try raw_decode from each line that opens a
    top-level object, last candidate first — warning lines trailing the object
    are tolerated by raw_decode, and a brace-bearing warning that isn't valid
    JSON simply fails its candidate and falls through to the real report."""
    dec = json.JSONDecoder()
    lines = raw.splitlines(keepends=True)
    starts = [i for i, ln in enumerate(lines) if ln.lstrip().startswith("{")]
    for i in reversed(starts):
        try:
            obj, _end = dec.raw_decode("".join(lines[i:]).lstrip())
        except (json.JSONDecodeError, ValueError):
            continue
        if isinstance(obj, dict):
            return obj
    return {}


def build_digest(report: dict, sf_dir: str) -> dict:
    """The committable per-name digest (VERDICT r6 item 6): rows /
    hash_match / value_hash (checksum-mode entries carry their numeric
    digest) / err per name, plus the git head — so coverage and hashes diff
    across rounds without reruns."""
    head = subprocess.run(
        ["git", "rev-parse", "HEAD"], capture_output=True, text=True, cwd=REPO
    ).stdout.strip()
    digest = {
        "sf_dir": sf_dir,
        "git_head": head,
        "pass": sum(1 for r in report.values() if r.get("hash_match")),
        "fail": sum(1 for r in report.values() if not r.get("hash_match")),
        "names": {
            q: {
                "rows": r.get("spark_rows"),
                "hash_match": bool(r.get("hash_match")),
                "value_hash": r.get("value_hash", r.get("spark_digest")),
            }
            for q, r in sorted(report.items())
        },
    }
    for q, r in report.items():
        if r.get("err"):
            digest["names"][q]["err"] = str(r["err"])[:200]
    return digest


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("--heavy-dir", default=None)
    ap.add_argument("--mem", default="16g")
    ap.add_argument("--batch", type=int, default=40)
    ap.add_argument("--out", default="/tmp/sweep_out")
    ap.add_argument("--only", nargs="*", default=None, help="restrict to these queries")
    ap.add_argument(
        "--checksum",
        action="store_true",
        help="collect-free digest compare for float/ts-free outputs "
        "(huge results at scaled dirs); others fall back to collect",
    )
    ap.add_argument(
        "--digest-out",
        default=None,
        help="also write a compact per-name digest (rows/hash_match/err + git "
        "head) to this path — the committable artifact (VERDICT r6 item 6: "
        "err_sim.log keeps only batch counts; the per-name report was "
        "discarded, so coverage and hashes weren't diffable across rounds)",
    )
    ap.add_argument(
        "--slice-heavy",
        action="store_true",
        help="run the declared-quadratic-oracle entries AT the main dir in "
        "deterministic-subsample (slice) mode instead of routing them to "
        "--heavy-dir (queries/slice_cert.py)",
    )
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    import __spark_entry__ as e

    names = sorted(e.queries())
    if args.only:
        names = [n for n in names if n in set(args.only)]
    route_heavy = args.heavy_dir or args.slice_heavy
    heavy = [n for n in names if n in HEAVY_ORACLE and route_heavy]
    main_names = [n for n in names if n not in heavy]
    os.makedirs(args.out, exist_ok=True)

    batches: list[tuple[str, str, list[str]]] = []
    for i in range(0, len(main_names), args.batch):
        batches.append((f"b{i // args.batch:02d}", args.sf_dir, main_names[i : i + args.batch]))
    if heavy:
        # slice mode certifies the quadratic-oracle entries AT the main dir
        # (each via its deterministic-subsample twin); --heavy-dir remains the
        # fallback routing when slice mode is off
        heavy_dir = args.sf_dir if args.slice_heavy else args.heavy_dir
        batches.append(("heavy", heavy_dir, heavy))

    env = dict(os.environ, DRIVER_SIM_MEM=args.mem)
    report: dict[str, dict] = {}
    for label, sf, qs in batches:
        out_path = os.path.join(args.out, f"{label}.json")
        with open(os.path.join(args.out, f"{label}.err"), "wb") as errf, open(
            out_path, "wb"
        ) as outf:
            cmd = [sys.executable, os.path.join(REPO, "tools", "driver_sim.py"), sf]
            if args.checksum:
                cmd.append("--checksum")
            if label == "heavy" and args.slice_heavy:
                cmd.append("--slice")
            subprocess.run(
                cmd + qs,
                stdout=outf,
                stderr=errf,
                env=env,
                cwd=REPO,
                check=False,
            )
        try:
            with open(out_path) as f:
                raw = f.read()
        except OSError:
            raw = ""
        got = parse_report(raw)
        for q in qs:
            report[q] = got.get(q, {"err": f"batch {label} died before this query"})
        done = sum(1 for r in report.values() if r.get("hash_match"))
        print(f"{label}: {done}/{len(report)} pass so far", file=sys.stderr)

    n_pass = sum(1 for r in report.values() if r.get("hash_match"))
    fails = {k: v for k, v in report.items() if not v.get("hash_match")}
    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=1)
    if args.digest_out:
        with open(args.digest_out, "w") as f:
            json.dump(build_digest(report, args.sf_dir), f, indent=1)
    print(json.dumps({"sf_dir": args.sf_dir, "pass": n_pass, "fail": len(fails), "fails": fails}, indent=1))
    print(f"PASS={n_pass} FAIL={len(fails)}", file=sys.stderr)
    return 0 if not fails else 1


if __name__ == "__main__":
    raise SystemExit(main())
