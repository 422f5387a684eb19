#!/usr/bin/env python3
"""Round-close baseline recording: per-entry MEDIANS of three full
`graft.Bench` sweeps -> tools/bench_expect.json + the BASELINE.md
3-column table body (printed to stdout for manual splice), plus a
continuity report vs the previous bench_expect.json using the bench's
own retry rules: max(1.8x, +0.75 s) OR a pure 2.0x ratio (the
sub-second class the absolute floor misses — q25/q28, round 15).

The continuity check GATES the write: if any entry crosses the
threshold vs the previous baseline, nothing is written and the script
exits nonzero — a regressed sweep cannot silently replace the recorded
baseline. Re-run after fixing (or pass --force to record anyway, e.g.
for a deliberate re-plan whose new cost is the intended one).

Usage: python3 tools/record_baseline.py [--force] sweep1.json sweep2.json sweep3.json
"""
import json, statistics, sys

args = [a for a in sys.argv[1:] if a != "--force"]
force = "--force" in sys.argv[1:]
assert len(args) == 3, "exactly three sweep files required"
sweeps = [json.load(open(p)) for p in args]
prev = json.load(open("tools/bench_expect.json"))
# a -1 anywhere is a failed query; guard RAW values, not medians — a
# single-sweep failure must fail the recording, not bias a median low
bad = [(i + 1, k) for i, s in enumerate(sweeps)
       for k, v in s["queries"].items() if v < 0]
assert not bad, f"failed queries in sweeps: {bad}"

# Sweep files written via SPARK_GRAFT_BENCH_OUT carry FULL entry names
# in "queries" (short names only appear on the stdout line).
names = set(sweeps[0]["queries"])
for s in sweeps[1:]:
    assert set(s["queries"]) == names, "sweeps cover different entry sets"

# Contention hygiene gate (r20 review): a recording taken from flagged
# sweeps would bake contention into the medians AND ratchet the canary
# floor up — silently re-opening the whole-run blind spot the floor
# exists to close. Any contention flag on any sweep refuses the
# recording unless --force (the round-18 procedure then applies: record
# a second batch and show the two agree).
flagged = [(i + 1, k, s.get(k)) for i, s in enumerate(sweeps)
           for k in ("retried", "refailed", "slow", "retry_contended",
                     "suspect_env")
           if s.get(k)] + \
          [(i + 1, "sweep_suspect_env", True) for i, s in enumerate(sweeps)
           if s.get("sweep_suspect_env")]
if flagged:
    print("contention flags present in sweeps:")
    for i, k, v in flagged:
        print(f"  sweep {i}: {k} = {v}")
    if not force:
        print("\nREFUSING to record from flagged sweeps (pass --force only "
              "after a second batch agrees — see BASELINE.md discipline).")
        sys.exit(1)

med = {k: round(statistics.median(s["queries"][k] for s in sweeps), 2)
       for k in sorted(names)}

# Canary-floor continuity (VERDICT r19 #5): persist the recording's
# I/O+shuffle canary floor (median of the three sweeps' run-min floors)
# keyed BY SCALE FACTOR, so a future sweep whose entire run is contended
# can self-flag against the recorded floor — the one contention class a
# run's own min cannot see. The key carries the sf basename because the
# canary scans $sfDir/customer.parquet: floors at different scales are
# not comparable.
sfs = {s.get("sf", "").rstrip("/").split("/")[-1] for s in sweeps}
assert len(sfs) == 1, f"sweeps ran at different scale factors: {sfs}"
canary_key = f"__canary_ms__{sfs.pop()}"
canary_med = (round(statistics.median(s["canary_ms"] for s in sweeps), 2)
              if all("canary_ms" in s for s in sweeps) else None)
# The floor only LOWERS automatically (a faster observation is a better
# estimate of the uncontended cost); raising it — e.g. after a genuine
# hardware change — requires --force, so ambient or sub-threshold
# contention can never ratchet the sweep-flag bar upward (r20 review).
if canary_med is not None and canary_key in prev and not force:
    canary_med = min(canary_med, prev[canary_key])
if canary_med is not None and canary_key in prev:
    print(f"canary floor: {prev[canary_key]} -> {canary_med} ms")

# continuity vs previous medians — computed BEFORE the write so a
# regressed recording can't overwrite the baseline unnoticed. Only a
# REGRESSION (new slower than prev past the threshold) blocks recording;
# a same-magnitude improvement is reported but records freely — refusing
# it would force --force for exactly the change the gate exists to
# encourage (r16 advice). (Pseudo-rows like __canary_ms__* never appear
# in `names`, so they ride outside the per-entry continuity gate.)
slower, faster = [], []
for k in sorted(names & set(prev)):
    a, b = prev[k], med[k]
    hi, lo = max(a, b), min(a, b)
    if hi > max(1.8 * lo, lo + 0.75) or hi > 2.0 * lo:
        (slower if b > a else faster).append((k, a, b))

print(f"entries: {len(med)}  (new: {sorted(names - set(prev))})")
print(f"sweep totals: {[s['value'] for s in sweeps]}  median-sum: {round(sum(med.values()), 1)}")
print("continuity threshold crossers (prev -> new):")
for k, a, b in slower + faster:
    print(f"  {k}: {a} -> {b}" + ("  (improvement)" if b < a else ""))
if slower and not force:
    print(f"\nREFUSING to record: {len(slower)} entries REGRESSED past "
          "max(1.8x, +0.75s) or 2x vs the previous baseline. Fix and "
          "re-sweep, or pass --force for a deliberate re-plan/re-record.")
    sys.exit(1)

out = dict(med)
# keep any recorded floors for OTHER scale factors; refresh this one
out.update({k: v for k, v in prev.items() if k.startswith("__canary_ms__")})
if canary_med is not None:
    out[canary_key] = canary_med
with open("tools/bench_expect.json", "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)

print()
ks = sorted(med)
for i in range(0, len(ks), 3):
    row = ks[i:i + 3]
    cells = " | ".join(f"{k} | {med[k]:.2f}" for k in row)
    print(f"| {cells} |")
