#!/usr/bin/env python3
"""Generate tools/bench_demote.json — the committed single-pass set.

VERDICT r17 next #2: the driver benches the same tree at 32 and 8 cpus,
and the adaptive budget machinery demoted 54 entries at 32c vs 9 at 8c,
so nearly every PERF scaling ratio compared a cold sample to a warm one.
Bench now pins a COMMITTED set of entries to single-pass at every core
count; this script sizes that set from the committed medians so the
remaining 2-pass projection fits the bench budget even under the
measured 32-cpu additive tax (~+0.3 s/pass, BENCH_r10/r13 calibration).

Greedy, largest-median-first over non-iterative median-backed queries —
the same priority the adaptive sacrifice uses, so the committed set is
the set the 32c run would have shed anyway, now shed symmetrically.

Usage: tools/make_demote.py [medians.json] > tools/bench_demote.json
"""
import json, re, sys, pathlib

ROOT = pathlib.Path(__file__).resolve().parent.parent
BUDGET = 475.0
TARGET = BUDGET * 0.92 - 10.0   # headroom below the shed threshold
# 32-cpu additive per-pass tax: BENCH_r10 measured ~+0.3 s/pass raw;
# with the clean-band r18 medians 0.25 sizes the committed set to ~43
# entries — between the honest clean-band projection (28) and the 54
# the adaptive path shed in the banded r17 32-cpu driver run, so a
# moderately banded run still fits without asymmetric extra sheds
TAX = 0.25
WARMUP_S = 8.0                  # untimed JIT warmup + session start


def iterative_names():
    names = set()
    for f in (ROOT / "src/main/scala/graft/queries").glob("*.scala"):
        src = f.read_text()
        # each Q("name", ...) block ends at the next Q("; iterative flag
        # is declared inside the block
        starts = [(m.start(), m.group(1)) for m in re.finditer(r'Q\("(q_\w+)"', src)]
        for (pos, name), end in zip(starts, [s for s, _ in starts[1:]] + [len(src)]):
            if "iterative = true" in src[pos:end]:
                names.add(name)
    return names


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else str(ROOT / "tools/bench_medians.json")
    med = json.load(open(path))
    subs = {k: v for k, v in med.items() if k.startswith("substrate:")}
    qs = {k: v for k, v in med.items() if not k.startswith("substrate:")}
    it = iterative_names()

    def two(m): return 2.45 * m + 0.1 + 2 * TAX
    def one(m): return 1.35 * m + 0.05 + TAX

    demote = set()
    def projection():
        base = WARMUP_S + sum(subs.values()) + len(subs) * TAX
        return base + sum(one(m) if n in demote else two(m)
                          for n, m in qs.items())

    cand = sorted((m, n) for n, m in qs.items() if n not in it)
    while projection() > TARGET and cand:
        m, n = cand.pop()         # largest median first
        demote.add(n)
    sys.stderr.write(
        f"projection {projection():.0f}s (target {TARGET:.0f}), "
        f"demoted {len(demote)} of {len(qs)} queries "
        f"({sum(med[n] for n in demote):.1f}s of median mass)\n")
    print(json.dumps(sorted(demote), indent=1))


if __name__ == "__main__":
    main()
