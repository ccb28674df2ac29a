"""Round-close perf regression scan (VERDICT r07 item 2).

Compares two bench sidecars query-by-query on MIN-of-recorded-runs
engine time and flags every shared query that regressed by BOTH >1.5x
relative AND >1s absolute — the repo's standing filter. The r07 lesson:
the scan must run against the FINAL committed sidecars; an intra-round
scan on a superseded pair reported "zero hits" while the refreshed pair
carried two >1.5x/+1s streaming upticks the judge then found. Protocol:
whenever bench sidecars are (re)generated at round close, re-run

    python tools/regression_scan.py <old_sidecar> <new_sidecar...>

with the previous round's quiet sidecar as <old> and EVERY final
committed sidecar of this round as <new> (min is taken across all of
them, mirroring the judge's min-of-two reproduction). Exit code 1 when
hits exist, so a round-close script can gate on it. Hits are not
necessarily bugs — state-store-backed streaming rows show cold-run
variance (PERF.md round-8 adjudication) — but each hit owes a
tools/adjudicate.py session before the round ends.
"""

from __future__ import annotations

import json
import sys


def _min_engine(paths: list[str]) -> dict[str, float]:
    """name -> min engine seconds across all runs in all given sidecars."""
    best: dict[str, float] = {}
    for path in paths:
        with open(path) as f:
            d = json.load(f)
        for name, m in d.get("engine_metrics", {}).items():
            runs = [
                r
                for r in (
                    m.get("runs_engine_ms")
                    or [m.get("executor_run_time_ms")]
                )
                if r is not None
            ]
            if not runs:
                # A malformed/partial sidecar entry must not abort the
                # scan that gates round close (ADVICE r08) — warn and
                # move on; the query still participates via any other
                # sidecar that carries usable runs.
                print(
                    f"WARN {path}: {name} has no usable engine-time "
                    "runs; skipping entry",
                    file=sys.stderr,
                )
                continue
            lo = min(runs) / 1000.0
            best[name] = min(best.get(name, float("inf")), lo)
    return best


def main() -> int:
    if len(sys.argv) < 3:
        sys.exit(
            "usage: python tools/regression_scan.py OLD_SIDECAR[,OLD2...] "
            "NEW_SIDECAR [NEW_SIDECAR2 ...]"
        )
    # OLD may be comma-separated: min over ALL of the previous round's
    # committed sidecars, symmetric with the min over all NEW ones —
    # an asymmetric min-of-2 vs min-of-4 denominator flattered round 8's
    # headline 0.93x (symmetric: 0.96x; VERDICT r08).
    old = _min_engine(sys.argv[1].split(","))
    new = _min_engine(sys.argv[2:])
    shared = sorted(set(old) & set(new))
    if not shared:
        sys.exit("no shared queries between sidecars")
    tot_old = sum(old[n] for n in shared)
    tot_new = sum(new[n] for n in shared)
    print(
        f"{len(shared)} shared queries  total engine "
        f"{tot_old:.1f}s -> {tot_new:.1f}s  ({tot_new / tot_old:.2f}x)"
    )
    hits = [
        n
        for n in shared
        if new[n] > 1.5 * old[n] and new[n] - old[n] > 1.0
    ]
    for n in hits:
        print(
            f"HIT {n}: {old[n]:.2f}s -> {new[n]:.2f}s "
            f"({new[n] / old[n]:.2f}x, +{new[n] - old[n]:.2f}s)"
        )
    if not hits:
        print("zero >1.5x/+1s hits")
    return 1 if hits else 0


if __name__ == "__main__":
    raise SystemExit(main())
