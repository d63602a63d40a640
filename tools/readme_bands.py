#!/usr/bin/env python3
"""Regenerate README.md's in-bench steady-state paragraph from the
committed BENCH_detail.json, so the documented bands are BY CONSTRUCTION
the final gate artifact's numbers (r14/r15 lesson: hand-written bands
captured mid-round drifted from the shipped artifact twice).

Rewrites the block between BENCH_BANDS_BEGIN / BENCH_BANDS_END markers.
Run after the LAST bench of a round, before the closing commit:

    python3 tools/readme_bands.py
"""
import json
import pathlib
import re
import sys

root = pathlib.Path(__file__).resolve().parent.parent
detail_path = root / "BENCH_detail.json"
readme_path = root / "README.md"

d = json.loads(detail_path.read_text())
q = d["queries"]
rt = d.get("retimed", {})
nq = d["nq"]
total = d["value"]

SPOTLIGHT = ["q141", "q84", "q44", "q39", "q121", "q115", "q116", "q177"]


def band(name: str) -> str:
    first = q.get(name)
    if first is None:
        return f"{name} n/a"
    second = rt.get(name)
    if second is None:
        return f"{name} {first:.1f} s"
    return f"{name} {first:.1f} / {second:.1f} s"


calib = d.get("calib", [])
calib_ml = d.get("calibMl", [])
jvm = d.get("jvm", {})


def triple(v):
    return "[" + ", ".join(f"{x:.2f}" if isinstance(x, float) else str(x)
                           for x in v) + "]"


stamp = d.get("generatedAt", "unstamped")

lines = [
    f"In-bench steady state at sf0.1 / local[32], generated from the "
    f"committed `BENCH_detail.json` — source run: {nq} queries, "
    f"{total:.1f} s total, generated {stamp} on the builder host "
    f"(first / retimed):",
    "; ".join(band(n) for n in SPOTLIGHT) + ".",
    f"Calibration probes (pre / post / post-retime): scalar "
    f"{triple(calib)}, ML-shaped {triple(calib_ml)}.",
    "Host-variance envelope: the scalar calib probe has ranged "
    "0.05–0.13 s across runs of IDENTICAL code on this host "
    "(±25%); a driver artifact whose calib/calibMl pre reads "
    ">1.3× its post ran load-contaminated, and its first samples "
    "(not its retimed values) should be read accordingly.",
    "Retime-phase rule: each retimed sample carries its own "
    "(gcSec, cgEntries, heapMb) deltas in `retimedJvm`, and a 1-s "
    "ML probe runs every 8 retimes (`retimeCalib`). A retimed value "
    "whose own gcSec delta exceeds 25% of the sample, or whose "
    "nearest following probe reads >1.3× the post-pass calibMl, ran "
    "polluted — read min(first, retimed) as that query's "
    "steady-state instead of the retime alone.",
    "Hypervisor-throttle rule: `jvm.stealPct` records host CPU steal "
    "per phase [prewarm, first pass, retime] and each `retimedJvm` "
    "entry its own sample's steal %, read from /proc/stat (this guest "
    "has measured 0-10% average steal across host migrations, spiking "
    "higher under burst — it inflates wall-clock while every in-JVM "
    "probe reads clean). A phase or sample whose steal exceeds ~5% ran "
    "hypervisor-throttled: read its timings as lower-bounded, not as a "
    "regression; cross-round comparisons are only meaningful between "
    "artifacts whose steal columns agree.",
    "CPU-capping rule (r19): steal is zero when the hypervisor caps "
    "bandwidth instead of preempting (the r18 q177 class: 570 s first "
    "sample, steal 3.9%, gc clean). Every grid-class first sample and "
    "every retime carries `spinPre` — an all-thread fixed pure-CPU "
    "probe timed just before the sample — and `jvm.spinSec` holds "
    "[reference, post-first-pass, post-retime]. A sample whose "
    "spinPre exceeds ~1.3x the reference ran CPU-capped: read it as "
    "lower-bounded. First samples >= 2 s carry their own "
    "gcSec/cgEntries/heapMb/steal deltas in `firstJvm` (the first "
    "pass is adjudicable per query, not just per phase).",
    "Pinned-reference rule (r20): spin ratios are read against "
    "`jvm.spinRefPinned` — the best-ever probe persisted in "
    "SPIN_REF.json — NOT against the run's own `spinSec[0]`: a run "
    "that STARTS capped inflates its own reference and every "
    "self-relative ratio under-flags (the r19 driver artifact let a "
    "12.6x retime excursion stamp clean this way). A run whose "
    "`jvm.hostCapped` is true executed on a capped host end to end: "
    "every timing in it is a lower bound and it must not seed "
    "cross-round comparisons.",
    "Grid-tranche rule (r20): `gridTranches` times q177's three "
    "dataset tranches AND q141's four per-classifier tranches as the "
    "two queries' RETIME samples, each with its own calm + "
    "spin/steal/gc stamps and a following 1-s ML probe; the recorded "
    "retime is the tranche sum, an UPPER bound of the monolith's "
    "steady state (tranches forfeit the shared work queue), so "
    "first >> tranche-sum names the first sample as polluted, and a "
    "single inflated tranche names the polluted window.",
    "Grid-concurrency rule (r20): grid-class samples carry `gridPar` "
    "(the lowest steal-capped concurrent-cell bound any runGridShared "
    "inside the sample actually used; `gridParAll` lists every "
    "invocation when there were several). Cross-round grid timings "
    "are only fixed-configuration comparable when both artifacts' "
    "gridPar stamps AGREE — a capped grid (gridPar < 32) ran a "
    "different schedule, mirroring the steal-column rule.",
]
# apply the rule to THIS artifact: name any polluted retimes so the
# reader doesn't have to re-derive the arithmetic from the JSON
rjvm = d.get("retimedJvm", {})
rcal = d.get("retimeCalib", [])
ml_post = calib_ml[1] if len(calib_ml) > 1 else None
flagged = []
# ratio denominator: the PINNED reference when present (a capped run's
# own spinSec[0] under-flags — the r19 lesson), else the run's own
spin_ref = jvm.get("spinRefPinned") or (jvm.get("spinSec") or [None])[0]
if jvm.get("hostCapped"):
    flagged.append(
        f"RUN-LEVEL: hostCapped=true (run spin reference "
        f"{(jvm.get('spinSec') or [0])[0]:.3f} s vs pinned "
        f"{jvm.get('spinRefPinned'):.3f} s) — every timing is a lower bound")
for name, st in rjvm.items():
    second = rt.get(name)
    if second is None or second <= 0:
        continue
    if st.get("gcSec", 0.0) > 0.25 * second:
        flagged.append(f"{name} (gc {st['gcSec']:.1f} s in a "
                       f"{second:.1f} s sample)")
    if st.get("stealPct", 0.0) > 5.0:
        flagged.append(f"{name} (host steal {st['stealPct']:.1f}% during "
                       f"a {second:.1f} s sample)")
    if spin_ref and st.get("spinPre", 0.0) > 1.3 * spin_ref:
        flagged.append(f"{name} (spin probe {st['spinPre']:.2f} s vs "
                       f"{spin_ref:.2f} s reference — CPU-capped window)")
# same spin rule over the FIRST-pass ledger
for name, st in d.get("firstJvm", {}).items():
    sp = st.get("spinPre")
    if spin_ref and sp and sp > 1.3 * spin_ref:
        flagged.append(f"{name} first sample (spin probe {sp:.2f} s vs "
                       f"{spin_ref:.2f} s reference — CPU-capped window)")
    fs = st.get("sec", 0.0)
    if fs > 0 and st.get("gcSec", 0.0) > 0.25 * fs:
        flagged.append(f"{name} first sample (gc {st['gcSec']:.1f} s in "
                       f"{fs:.1f} s)")
    if st.get("stealPct", 0.0) > 5.0:
        flagged.append(f"{name} first sample (host steal "
                       f"{st['stealPct']:.1f}%)")
if ml_post:
    hot = [p for p in rcal if p.get("calibMl", 0) > 1.3 * ml_post]
    for p in hot:
        flagged.append(f"probe after {p['after']} read "
                       f"{p['calibMl']:.2f} vs {ml_post:.2f} post")
# on a persistently-throttled host nearly every sample carries a flag;
# cap the inline list so the README stays readable — the full per-sample
# stamps live in BENCH_detail.json
MAX_FLAGS = 12
shown = flagged[:MAX_FLAGS]
more = len(flagged) - len(shown)
lines.append(
    "Samples flagged by those rules in this artifact ("
    f"{len(flagged)} total; full stamps in BENCH_detail.json): "
    + ("; ".join(shown) if shown else "none")
    + (f"; … +{more} more" if more > 0 else "") + ".")
if jvm:
    lines.append(
        f"JVM state at the same three points: codegen-cache entries "
        f"{jvm.get('cgEntries')}, JIT code-heap MB {jvm.get('codeMb')}, "
        f"metaspace MB {jvm.get('metaMb')}"
        + (f", host steal % per phase {triple(jvm['stealPct'])}"
           if jvm.get("stealPct") else "") + ".")
    if "gcSec" in jvm:
        lines.append(
            f"Cumulative GC s {jvm['gcSec']} (the retime phase forces a "
            f"full GC before each sample — most of the tail is that), "
            f"used heap MB {jvm.get('heapMb')}, CacheManager entries "
            f"{jvm.get('cachedPlans')}"
            + (f", spin probe s {triple(jvm['spinSec'])}"
               if jvm.get("spinSec") else "") + ".")
tr = d.get("gridTranches", d.get("q177Tranches", []))
for qname in sorted({t.get("query", "q177") for t in tr}):
    qtr = [t for t in tr if t.get("query", "q177") == qname]
    t_sum = sum(t.get("sec", 0.0) for t in qtr)
    parts = "; ".join(
        f"{t['tranche']} {t['sec']:.1f} s (spin {t.get('spinPre', -1):.2f}, "
        f"steal {t.get('stealPct', -1):.1f}%, gc {t.get('gcSec', 0):.1f} s, "
        f"probe-after {t.get('calibMlAfter', -1):.2f} s)" for t in qtr)
    lines.append(
        f"{qname} retime tranches (sum {t_sum:.1f} s, an upper bound of "
        f"the monolith's steady state): {parts}.")
block = ("<!-- BENCH_BANDS_BEGIN: generated by tools/readme_bands.py from "
         "BENCH_detail.json - do not hand-edit -->\n"
         + "\n".join(lines) +
         "\n<!-- BENCH_BANDS_END -->")

text = readme_path.read_text()
pattern = re.compile(
    r"<!-- BENCH_BANDS_BEGIN.*?BENCH_BANDS_END -->", re.DOTALL)
if not pattern.search(text):
    sys.exit("README.md has no BENCH_BANDS markers")
readme_path.write_text(pattern.sub(lambda _: block, text))
print("README bands refreshed:")
for ln in lines:
    print(" ", ln)
