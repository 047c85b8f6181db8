#!/usr/bin/env python3
"""Spread-aware per-query bench regression gate (VERDICT r05 #4).

Compares the current BENCH_full.json against the previous round's
artifact and flags every query whose steady time drifted past noise:

    flag if cur_min > 1.5 * prior_min + max(prior_spread, cur_spread)
            and cur_min - prior_min > 0.20s   (absolute noise floor)

q44 drifted for three rounds because nothing watched it; this makes a
drift a one-command diff instead of a judge finding.

Usage: bench_gate.py [current] [baseline]
  current  defaults to BENCH_full.json
  baseline defaults to the highest-numbered BENCH_r*.json in the repo
Both formats are accepted for either side:
  full:    {"queries": {"q44_math_fns": {"sec": s, "spread_sec": s}}}
  compact: {"queries": {"44": [min_centisec, spread_centisec, ...]}}
Writes BENCH_gate.json (flags + verdict) and exits 1 on any flag.
"""
import glob
import json
import re
import sys

# Artifacts recorded on a contended machine (controls inflated past the
# tools/bench_controls.json threshold) must never serve as a gate
# baseline — r07's run overstated times ~1.7x and would mask real
# regressions up to ~10x. Post-r07 artifacts carry a "polluted" stamp
# from Bench.scala's control calibration; r07 itself predates the stamp.
# BENCH_r08.json carried the stamp (start_factor 2.82, adjudicated
# polluted by the r8 judge) but the driver's 2000-char tail capture
# lost the line PREFIX, so the stamp is unparseable from the artifact —
# listed here so the gate never baselines on it.
KNOWN_POLLUTED = {"BENCH_r07.json", "BENCH_r08.json"}


def is_polluted(path):
    if path.split("/")[-1] in KNOWN_POLLUTED:
        return True
    try:
        with open(path) as f:
            data = json.load(f)
    except Exception:
        return False
    if "tail" in data and "queries" not in data:
        if isinstance(data.get("parsed"), dict):
            data = data["parsed"]
        else:
            # the greedy-tail extraction can match a span that is not
            # valid JSON (truncated tail) — an unreadable artifact must
            # degrade to False like every other parse failure here, not
            # crash the gate (ADVICE r08)
            try:
                m = re.search(r'\{"metric".*\}', data.get("tail", ""))
                data = json.loads(m.group(0)) if m else {}
            except Exception:
                return False
    ctl = data.get("controls", {})
    return bool(data.get("polluted") or
                (ctl.get("polluted") if isinstance(ctl, dict) else False))


def load(path):
    """-> {query_number: (name, min_sec, spread_sec)}"""
    with open(path) as f:
        data = json.load(f)
    # driver round snapshot: the bench line is raw stdout in "tail"
    # (with "parsed" unreliably None); dig the {"metric":...} line out
    if "tail" in data and "queries" not in data:
        if isinstance(data.get("parsed"), dict):
            data = data["parsed"]
        else:
            m = re.search(r'\{"metric".*\}', data["tail"])
            if not m:
                print(f"{path}: no bench line in tail", file=sys.stderr)
                sys.exit(2)
            data = json.loads(m.group(0))
    out = {}
    queries = data.get("queries", {})
    for name, v in queries.items():
        m = re.match(r"^q?(\d+)", name)
        if not m:
            continue
        num = m.group(1).lstrip("0") or "0"
        if isinstance(v, dict):
            out[num] = (name, float(v["sec"]), float(v.get("spread_sec", 0.0)))
        else:  # compact [min_cs, spread_cs, tasks?]
            out[num] = (name, v[0] / 100.0, (v[1] if len(v) > 1 else 0) / 100.0)
    return out


def main():
    cur_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_full.json"
    if is_polluted(cur_path):
        print(f"{cur_path}: POLLUTED run (control queries inflated past "
              "threshold) — re-record on a quiet machine; refusing to gate",
              file=sys.stderr)
        sys.exit(2)
    if len(sys.argv) > 2:
        base_path = sys.argv[2]
    else:
        rounds = sorted(glob.glob("BENCH_r[0-9]*.json"),
                        key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
        rounds = [p for p in rounds if not is_polluted(p)]
        if not rounds:
            print("no clean BENCH_r*.json baseline found", file=sys.stderr)
            sys.exit(2)
        base_path = rounds[-1]
    cur, base = load(cur_path), load(base_path)

    # Queries whose registered CONTRACT changed in a given round (the
    # body computes genuinely more/different work): a baseline artifact
    # from an EARLIER round times a different query, so the comparison
    # is apples-to-oranges and is skipped — against same-or-later
    # baselines the query gates normally.
    RECONTRACTED = {
        "70": 8,   # r8: rows-only sketch -> accuracy contract (adds
                   # exact percentiles alongside approx_percentile)
        "100": 8,  # r8: unbounded overlap-pair output -> bounded
                   # per-key aggregates
    }
    base_round = None
    m = re.search(r"r(\d+)", base_path)
    if m:
        base_round = int(m.group(1))

    flags, improved, new, skipped = [], 0, 0, []
    for num, (name, cmin, cspread) in sorted(cur.items(), key=lambda kv: int(kv[0])):
        if num not in base:
            new += 1
            continue
        if (num in RECONTRACTED and base_round is not None
                and base_round < RECONTRACTED[num]):
            skipped.append(name)
            continue
        bname, bmin, bspread = base[num]
        noise = max(bspread, cspread)
        if cmin > 1.5 * bmin + noise and cmin - bmin > 0.20:
            flags.append({
                "query": name, "prior_sec": round(bmin, 4),
                "cur_sec": round(cmin, 4),
                "ratio": round(cmin / bmin, 2) if bmin > 0 else None,
                "noise_sec": round(noise, 4),
            })
        elif cmin < bmin:
            improved += 1

    report = {
        "baseline": base_path, "current": cur_path,
        "checked": len(cur), "new_queries": new, "improved": improved,
        "recontracted_skipped": skipped,
        "regressions": flags,
    }
    with open("BENCH_gate.json", "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    sys.exit(1 if flags else 0)


if __name__ == "__main__":
    main()
