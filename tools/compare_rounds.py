"""Diff two rounds' committed artifacts in one command (VERDICT r7 ask 7).

Rounds accumulate gates, certifications, sweeps, and bench history; triaging
"what changed since round N" by hand means opening half a dozen JSON files.
This tool prints, for any two round tags:

  1. per-name VALUE-HASH drift — names whose committed result hash changed
     between the rounds' hash-bearing artifacts (SWEEP_r{N}.json names +
     CERTIFICATION_r{N}.json report), plus names only one round covered;
  2. calibration-normalized TIME drift — totals and per-entry ratios from
     BENCH_r{NN}.json, divided by the env_shift the calibration anchor
     explains (ratios > --bar after normalization are listed as drift).

Usage:
  python tools/compare_rounds.py r6 r7            # repo-root artifacts
  python tools/compare_rounds.py r6 r7 --bar 1.3  # custom time-drift bar

Exit status is 0 even when drift is found (a reporting tool, not a gate);
--fail-on-hash-drift flips that for CI-style use.
"""

from __future__ import annotations

import argparse
import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(path: str) -> dict | None:
    try:
        with open(path) as fh:
            return json.load(fh)
    except (OSError, json.JSONDecodeError):
        return None


def _round_paths(tag: str, stem: str) -> list[str]:
    """Artifact names are inconsistently zero-padded across rounds
    (BENCH_r07 / SWEEP_r7); try both."""
    n = int(tag.lstrip("rR"))
    return [
        os.path.join(ROOT, f"{stem}_r{n:02d}.json"),
        os.path.join(ROOT, f"{stem}_r{n}.json"),
    ]


def round_hashes(tag: str) -> tuple[dict[str, str], list[str]]:
    """{name: value_hash} from every hash-bearing artifact of the round,
    plus the artifact filenames used. Later sources win on conflict, which
    never matters in practice: sweep and certification run the same code."""
    hashes: dict[str, str] = {}
    used: list[str] = []
    for stem, extract in (
        ("CERTIFICATION", lambda d: d.get("report", {})),
        ("SWEEP", lambda d: d.get("names", {})),
    ):
        for path in _round_paths(tag, stem):
            data = _load(path)
            if data is None:
                continue
            used.append(os.path.basename(path))
            for name, rec in extract(data).items():
                vh = rec.get("value_hash") if isinstance(rec, dict) else None
                if vh:
                    hashes[name] = vh
            break
    return hashes, used


def round_bench(tag: str) -> dict | None:
    for path in _round_paths(tag, "BENCH"):
        data = _load(path)
        if data is not None:
            return data.get("parsed", data)
    return None


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("round_a", help="earlier round tag, e.g. r6")
    ap.add_argument("round_b", help="later round tag, e.g. r7")
    ap.add_argument("--bar", type=float, default=1.3,
                    help="normalized per-entry time ratio above which an "
                         "entry is listed as drift (default 1.3)")
    ap.add_argument("--fail-on-hash-drift", action="store_true")
    args = ap.parse_args()

    # -- hash drift ----------------------------------------------------------
    ha, used_a = round_hashes(args.round_a)
    hb, used_b = round_hashes(args.round_b)
    common = sorted(set(ha) & set(hb))
    changed = [n for n in common if ha[n] != hb[n]]
    only_a = sorted(set(ha) - set(hb))
    only_b = sorted(set(hb) - set(ha))
    print(f"== value-hash drift {args.round_a} -> {args.round_b}")
    print(f"   sources: {used_a or 'none'} vs {used_b or 'none'}")
    print(f"   common names: {len(common)}  identical: {len(common) - len(changed)}"
          f"  CHANGED: {len(changed)}")
    for n in changed:
        print(f"   ! {n}: {ha[n][:12]} -> {hb[n][:12]}")
    if only_a:
        print(f"   only in {args.round_a} ({len(only_a)}): {only_a[:10]}"
              f"{' ...' if len(only_a) > 10 else ''}")
    if only_b:
        print(f"   only in {args.round_b} ({len(only_b)}): {only_b[:10]}"
              f"{' ...' if len(only_b) > 10 else ''}")

    # -- calibration-normalized time drift ------------------------------------
    ba, bb = round_bench(args.round_a), round_bench(args.round_b)
    print(f"\n== bench drift {args.round_a} -> {args.round_b}")
    if not ba or not bb:
        print("   (bench artifact missing on one side; skipping)")
    else:
        cal_a, cal_b = ba.get("calibration_sec"), bb.get("calibration_sec")
        env = (cal_b / cal_a) if cal_a and cal_b else None
        tot_a, tot_b = ba.get("value"), bb.get("value")
        raw = round(tot_b / tot_a, 3) if tot_a else None
        print(f"   total: {tot_a} -> {tot_b} s  raw ratio {raw}")
        if env:
            print(f"   calibration: {cal_a} -> {cal_b} s  env_shift {round(env, 3)}"
                  f"  NORMALIZED total ratio {round(raw / env, 3)}")
        else:
            print("   calibration anchor missing on one side: raw ratios only "
                  "(pre-r7 rounds are unanchored)")
        qa, qb = ba.get("queries", {}), bb.get("queries", {})
        drifted = []
        for name in sorted(set(qa) & set(qb)):
            if not qa[name]:
                continue
            r = qb[name] / qa[name]
            rn = r / env if env else r
            if rn > args.bar:
                drifted.append((name, qa[name], qb[name], round(rn, 2)))
        label = "normalized" if env else "raw"
        print(f"   common timed entries: {len(set(qa) & set(qb))}  "
              f"{label} ratio > {args.bar}: {len(drifted)}")
        for name, a, b, rn in drifted:
            print(f"   ! {name}: {a} -> {b} s  ({label} {rn}x)")
        note = bb.get("queries_note")
        if note:
            print(f"   note: {note}")

    if args.fail_on_hash_drift and changed:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
