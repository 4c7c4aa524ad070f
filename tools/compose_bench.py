#!/usr/bin/env python
"""Compose BENCH.md's measured-efficiency and ceiling sections from the
scaling-run JSON artifacts — no hand-transcribed numbers.

The r03 verdict (and an r04 re-check) found BENCH.md quoting walls that
disagreed with the pair reports it summarized: every mismatch came from
hand-copying numbers between files. This tool makes the summary tables
a FUNCTION of the run artifacts: ``bench_scaling.py`` prints one JSON
line per pair run (saved as e.g. ``BENCH_8to32.json``); this script
reads those plus an optional long quiet-window membw probe JSON and
rewrites everything between the AUTOGEN markers in BENCH.md, leaving
the hand-written narrative (protocol, findings history) untouched.

Usage:
    python tools/compose_bench.py BENCH_8to32.json BENCH_4to16.json \
        [--probe membw_long.json] [--out BENCH.md]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
BEGIN = "<!-- AUTOGEN:SCALING BEGIN (tools/compose_bench.py) -->"
END = "<!-- AUTOGEN:SCALING END -->"

PROBE_LEVELS = (1, 2, 4, 8, 16, 32)


def _pair_levels(rep: dict) -> tuple[int, int]:
    n, n4 = sorted(int(k) for k in rep["levels"])
    return n, n4


def _ceiling(probe: dict, n: int, n4: int) -> float | None:
    """Aggregate-random-access throughput ratio n→4n procs, as an
    efficiency (ratio / 4). None if the probe lacks the levels."""
    agg = probe.get("aggregate_x")
    if agg is None:
        # older probe dumps: derive from walls
        try:
            w1 = probe["procs_1"]["wall_s"]
            agg = {
                str(p): p * w1 / probe[f"procs_{p}"]["wall_s"]
                for p in PROBE_LEVELS
            }
        except KeyError:
            return None
    try:
        return float(agg[str(n4)]) / float(agg[str(n)]) / (n4 / n)
    except (KeyError, ZeroDivisionError):
        return None


def compose(pairs: list[dict], probe: dict | None) -> str:
    lines: list[str] = [BEGIN, ""]

    # ---- per-query efficiency table across pairs --------------------
    hdr = "| query |"
    sep = "|---|"
    for rep in pairs:
        n, n4 = _pair_levels(rep)
        hdr += f" {n}→{n4} speedup | {n}→{n4} eff |"
        sep += "---|---|"
    lines += [hdr, sep]
    queries = [q for q, d in pairs[0]["queries"].items() if d.get("counted")]
    for q in queries:
        row = f"| {q} |"
        for rep in pairs:
            d = rep["queries"].get(q)
            row += (
                f" {d['speedup']:.2f}× | {d['efficiency']:.2f} |"
                if d
                else " — | — |"
            )
        lines.append(row)
    row = "| **mean** |"
    for rep in pairs:
        row += f" | **{rep['scaling_efficiency']:.2f}** |"
    lines.append(row)
    lines.append("")

    # ---- wall-clock + throughput per pair ---------------------------
    for rep in pairs:
        n, n4 = _pair_levels(rep)
        lines.append(
            f"local[{n}] → local[{n4}] walls (s; composite-scored where "
            f"flagged in BENCH_{n}to{n4}.md):"
        )
        lines.append("")
        for q in queries:
            d = rep["queries"][q]
            lines.append(f"- {q}: {d['t_n']:.2f} → {d['t_4n']:.2f}")
        for key in ("pagerank_edges_per_sec", "cc_edges_per_sec"):
            t = rep.get(key)
            if t:
                lines.append(
                    f"- {key}: {t['n']:,.0f} → {t['4n']:,.0f} e/s "
                    f"(eff {t['efficiency']:.2f})"
                )
        lines.append("")

    # ---- ceiling table ----------------------------------------------
    lines += [
        "### Engine efficiency vs the box's own ceiling",
        "",
        "Each pair run embeds a membw probe taken alongside its trials",
        "(same noise conditions); the quiet-window row is a longer",
        "probe (MEMBW_REPS=80, MEMBW_PASSES=5, ~1.5s tasks) taken on an",
        "idle box. Ceiling = probe aggregate-throughput ratio N→4N ÷ 4.",
        "",
        "| pair | engine mean eff | ceiling (alongside) | ceiling "
        "(quiet) | engine / ceiling (alongside) |",
        "|---|---|---|---|---|",
    ]
    for rep in pairs:
        n, n4 = _pair_levels(rep)
        eng = rep["scaling_efficiency"]
        c_along = (
            _ceiling(rep["membw_profile"], n, n4)
            if rep.get("membw_profile")
            else None
        )
        c_quiet = _ceiling(probe, n, n4) if probe else None

        def fmt(x):
            return f"{x:.2f}" if x is not None else "—"

        ratio = fmt(eng / c_along) if c_along else "—"
        lines.append(
            f"| {n}→{n4} | {eng:.2f} | {fmt(c_along)} | {fmt(c_quiet)} "
            f"| {ratio} |"
        )
    lines += [
        "",
        "Probe aggregate throughput vs 1 proc (alongside each pair / "
        "quiet window):",
        "",
    ]
    hdr = "| procs |"
    sep = "|---|"
    for rep in pairs:
        n, n4 = _pair_levels(rep)
        hdr += f" with {n}→{n4} run |"
        sep += "---|"
    if probe:
        hdr += " quiet window |"
        sep += "---|"
    lines += [hdr, sep]
    for p in PROBE_LEVELS:
        row = f"| {p} |"
        for rep in pairs:
            pr = rep.get("membw_profile")
            c = _ceiling_agg(pr, p) if pr else None
            row += f" {c:.1f}× |" if c is not None else " — |"
        if probe:
            c = _ceiling_agg(probe, p)
            row += f" {c:.1f}× |" if c is not None else " — |"
        lines.append(row)
    lines += ["", END]
    return "\n".join(lines)


def _ceiling_agg(probe: dict, p: int) -> float | None:
    agg = probe.get("aggregate_x")
    if agg is not None:
        v = agg.get(str(p))
        return float(v) if v is not None else None
    try:
        w1 = probe["procs_1"]["wall_s"]
        return p * w1 / probe[f"procs_{p}"]["wall_s"]
    except KeyError:
        return None


def main() -> None:
    args = sys.argv[1:]
    out_path = REPO / "BENCH.md"
    probe = None
    pair_files = []
    i = 0
    while i < len(args):
        if args[i] == "--probe":
            probe = json.loads(Path(args[i + 1]).read_text())
            i += 2
        elif args[i] == "--out":
            out_path = Path(args[i + 1])
            i += 2
        else:
            pair_files.append(args[i])
            i += 1
    pairs = [json.loads(Path(f).read_text()) for f in pair_files]
    pairs.sort(key=lambda r: _pair_levels(r)[0], reverse=True)

    section = compose(pairs, probe)
    text = out_path.read_text()
    if BEGIN in text and END in text:
        pre = text.split(BEGIN)[0]
        post = text.split(END)[1]
        out_path.write_text(pre + section + post)
    else:
        raise SystemExit(
            f"{out_path} lacks the AUTOGEN markers; add\n{BEGIN}\n{END}\n"
            "around the section to regenerate."
        )
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
