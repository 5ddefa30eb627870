"""Diff two rounds' committed artifacts in one command (VERDICT r7 ask 7).

Rounds accumulate gates, certifications, sweeps, and bench history; triaging
"what changed since round N" by hand means opening half a dozen JSON files.
This tool prints, for any two round tags:

  1. per-name VALUE-HASH drift — names whose committed result hash changed
     between the rounds' hash-bearing artifacts (SWEEP_r{N}.json names +
     CERTIFICATION_r{N}.json report), plus names only one round covered;
  2. calibration-normalized TIME drift — totals and per-entry ratios from
     BENCH_r{NN}.json, divided by the env_shift the calibration anchor
     explains (ratios > --bar after normalization are listed as drift);
  3. SF10_PROBES drift (r9, VERDICT r8 ask 3) — per-family 1x/10x/100x time
     ratios, growth-ratio and growth-law (signed excess-over-linear) changes,
     skew twins, and quality floors between the two rounds;
  4. MEM_ENVELOPE drift (r9) — constrained-heap per-entry ratios, probe
     drift, and heap-config equality between the two rounds.

SF10/MEM artifacts are single-name files refreshed per round, so older
rounds' versions are resolved through git: a per-round suffixed copy
({stem}_r{N}.json) wins if present, else the version at the round's closing
commit (subject "round N: ..."), else the working tree (the in-progress
round). The source used is printed with each section.

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


def _git_round_commit(tag: str) -> str | None:
    """The round's closing commit (subject 'round N: ...'), or None while the
    round is still in progress."""
    import subprocess

    n = int(tag.lstrip("rR"))
    out = subprocess.run(
        ["git", "log", "--format=%H|%s"], capture_output=True, text=True,
        cwd=ROOT,
    ).stdout
    for line in out.splitlines():
        sha, _, subject = line.partition("|")
        if subject.startswith(f"round {n}:"):
            return sha
    return None


def round_single_artifact(tag: str, stem: str) -> tuple[dict | None, str]:
    """Resolve a single-name per-round-refreshed artifact (SF10_PROBES.json,
    MEM_ENVELOPE.json) for a round: suffixed copy > version at the round's
    closing commit > working tree. Returns (data, source_description)."""
    import subprocess

    for path in _round_paths(tag, stem):
        data = _load(path)
        if data is not None:
            return data, os.path.basename(path)
    commit = _git_round_commit(tag)
    if commit:
        touch = subprocess.run(
            ["git", "rev-list", "-1", commit, "--", f"{stem}.json"],
            capture_output=True, text=True, cwd=ROOT,
        ).stdout.strip()
        if touch:
            blob = subprocess.run(
                ["git", "show", f"{touch}:{stem}.json"],
                capture_output=True, text=True, cwd=ROOT,
            )
            if blob.returncode == 0:
                try:
                    return json.loads(blob.stdout), f"{stem}.json@{touch[:9]}"
                except json.JSONDecodeError:
                    pass
        return None, f"(no {stem}.json at round commit {commit[:9]})"
    data = _load(os.path.join(ROOT, f"{stem}.json"))
    if data is not None:
        return data, f"{stem}.json (working tree — round not yet committed)"
    return None, f"(no {stem} artifact found for {tag})"


def _ratio_lines(
    qa: dict, qb: dict, bar: float
) -> tuple[list[str], list[tuple[str, float, float, float]]]:
    """Shared per-entry numeric diff: (summary lines, over-bar entries)."""
    common = sorted(
        k for k in set(qa) & set(qb)
        if isinstance(qa[k], (int, float)) and isinstance(qb[k], (int, float))
        and qa[k]
    )
    over = []
    for k in common:
        r = qb[k] / qa[k]
        if r > bar:
            over.append((k, qa[k], qb[k], round(r, 2)))
    return common, over


def diff_sf10(tag_a: str, tag_b: str, bar: float) -> None:
    a, src_a = round_single_artifact(tag_a, "SF10_PROBES")
    b, src_b = round_single_artifact(tag_b, "SF10_PROBES")
    print(f"\n== SF10 probe drift {tag_a} -> {tag_b}")
    print(f"   sources: {src_a} vs {src_b}")
    if not a or not b:
        print("   (artifact missing on one side; skipping)")
        return
    ta, tb = a.get("times_sec", {}), b.get("times_sec", {})
    common, over = _ratio_lines(ta, tb, bar)
    dropped = sorted(set(ta) - set(tb))
    added = sorted(set(tb) - set(ta))
    print(f"   common timed entries: {len(common)}  raw ratio > {bar}: "
          f"{len(over)} (best-of-2 probes, unanchored — verify standalone "
          f"before believing a flag)")
    for k, va, vb, r in over:
        print(f"   ! {k}: {va} -> {vb} s  ({r}x)")
    if dropped:
        print(f"   entries dropped in {tag_b}: {dropped}")
    if added:
        print(f"   entries new in {tag_b}: {added}")
    ga, gb = a.get("growth_ratios", {}), b.get("growth_ratios", {})
    moved = [
        (k, ga[k], gb[k])
        for k in sorted(set(ga) & set(gb))
        if ga[k] and abs(gb[k] / ga[k] - 1) > 0.2
    ]
    if moved:
        print(f"   growth-ratio moves > 20%:")
        for k, va, vb in moved:
            print(f"   ~ {k}: {va} -> {vb}")
    la, lb = a.get("decontam_growth_law", {}), b.get("decontam_growth_law", {})
    for op in sorted(set(la) & set(lb)):
        ra = la[op].get("rel_excess_over_linear")
        rb = lb[op].get("rel_excess_over_linear")
        ha, hb = la[op].get("linear_law_holds"), lb[op].get("linear_law_holds")
        flag = "!" if hb is False else " "
        print(f"   {flag} growth-law {op}: rel_excess {ra} -> {rb}  "
              f"holds {ha} -> {hb}")
    for k in ("skew_minhash_ratio", "skew_cc_ratio", "floors_green"):
        if a.get(k) != b.get(k):
            print(f"   ~ {k}: {a.get(k)} -> {b.get(k)}")
    qa, qb = a.get("quality_floors_at_dir", {}), b.get("quality_floors_at_dir", {})
    for k in sorted(set(qa) & set(qb)):
        if qa[k] != qb[k]:
            print(f"   ~ floor {k}: {qa[k]} -> {qb[k]}")


def diff_mem(tag_a: str, tag_b: str, bar: float) -> None:
    a, src_a = round_single_artifact(tag_a, "MEM_ENVELOPE")
    b, src_b = round_single_artifact(tag_b, "MEM_ENVELOPE")
    print(f"\n== mem-envelope drift {tag_a} -> {tag_b}")
    print(f"   sources: {src_a} vs {src_b}")
    if not a or not b:
        print("   (artifact missing on one side; skipping)")
        return
    ca, cb = a.get("config", {}), b.get("config", {})
    if ca.get("driver_heap_max_bytes") != cb.get("driver_heap_max_bytes"):
        print(f"   ! heap DIFFERS: {ca.get('driver_heap_max_bytes')} vs "
              f"{cb.get('driver_heap_max_bytes')} — ratios below are not "
              f"like-for-like")
    va, vb = a.get("value"), b.get("value")
    if va and vb:
        print(f"   total: {va} -> {vb} s  raw ratio {round(vb / va, 3)}")
    elif va or vb:
        # one side lacks a total (e.g. an interrupted envelope run): say so
        # instead of dividing None and killing the whole report (ADVICE r9)
        print(f"   total: {va} -> {vb} s  (missing on one side; no ratio)")
    common, over = _ratio_lines(a.get("queries", {}), b.get("queries", {}), bar)
    print(f"   common entries: {len(common)}  raw ratio > {bar}: {len(over)}")
    for k, x, y, r in over:
        print(f"   ! {k}: {x} -> {y} s  ({r}x)")
    fa, fb = a.get("failures", {}) or {}, b.get("failures", {}) or {}
    if set(fa) != set(fb):
        print(f"   ~ failures: {sorted(fa)} -> {sorted(fb)}")
    pa, pb = a.get("probes", {}) or {}, b.get("probes", {}) or {}
    for k in sorted(set(pa) & set(pb)):
        xa = pa[k].get("sec") or pa[k].get("total_sec")
        xb = pb[k].get("sec") or pb[k].get("total_sec")
        if xa and xb and xb / xa > bar:
            print(f"   ! probe {k}: {xa} -> {xb} s ({round(xb / xa, 2)}x)")
        da = pa[k].get("latency_drift_steady_state")
        db = pb[k].get("latency_drift_steady_state")
        if da is not None and db is not None and da != db:
            print(f"   ~ probe {k} steady drift: {da} -> {db}")


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
        # r11 (VERDICT r10 ask 7): a run whose start/end anchors disagree
        # >15% sampled a box that shifted mid-run — a single-point anchor is
        # then under-determined, so REFUSE to normalize (raw ratios only).
        for tag, art in ((args.round_a, ba), (args.round_b, bb)):
            spread = art.get("anchor_spread")
            if spread and spread > 1.15:
                print(f"   !! {tag}: start/end anchors disagree {spread}x "
                      f"(cal {art.get('calibration_sec')} -> "
                      f"{art.get('calibration_end_sec')} s) — normalization "
                      "refused, raw ratios only")
                env = None
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

    diff_sf10(args.round_a, args.round_b, args.bar)
    diff_mem(args.round_a, args.round_b, args.bar)

    if args.fail_on_hash_drift and changed:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
