#!/usr/bin/env python
"""Render the waterfall chart: Es/N0@FER<0.1 per OFDM config —
(usage: plot_ber_r2.py [campaign.json] [out.png], defaults r2) —
documented table vs reference-build measured vs ours (baseband and
passband-effective). Data: docs/ber_r2.json + docs/ref_oracle_bb.json."""

import json
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

HERE = os.path.dirname(os.path.abspath(__file__))
DOCS = os.path.join(os.path.dirname(HERE), "docs")

# categorical slots in fixed order (validated default palette); the
# documented table is the neutral comparison baseline
C_OURS_BB = "#2a78d6"      # slot 1 blue
C_OURS_PB = "#eb6834"      # slot 2 orange
C_REF = "#1baf7a"          # slot 3 aqua
C_DOC = "#52514e"          # neutral ink
SURFACE = "#fcfcfb"
INK = "#0b0b0b"


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "ber_r2.json"
    out = sys.argv[2] if len(sys.argv) > 2 else "ber_r2_waterfalls.png"
    ber = json.load(open(os.path.join(DOCS, src)))
    oracle = json.load(open(os.path.join(DOCS, "ref_oracle_bb.json")))

    cfgs = list(range(17))
    doc = {r["config"]: r["documented_db"] for r in oracle["results"]}
    ref = {r["config"]: r["waterfall_fer10"] for r in oracle["results"]}
    ours_bb, ours_pb = {}, {}
    for r in ber["results"]:
        if r["density"] != "high" or r["waterfall_fer10"] is None:
            continue
        if r["harness"] == "baseband":
            ours_bb[r["config"]] = r["waterfall_fer10"]
        elif r["harness"] == "passband":
            ours_pb[r["config"]] = r["effective_waterfall_db"]

    fig, ax = plt.subplots(figsize=(10, 5.6), dpi=160)
    fig.patch.set_facecolor(SURFACE)
    ax.set_facecolor(SURFACE)

    def series(d, color, label, ls="-", marker="o", z=3):
        xs = [c for c in cfgs if c in d]
        ys = [d[c] for c in xs]
        ax.plot(xs, ys, ls, color=color, label=label, linewidth=2,
                marker=marker, markersize=6, zorder=z)
        return xs, ys

    series(doc, C_DOC, "documented table (common_defines.h)", ls="--",
           marker="", z=2)
    series(ref, C_REF, "reference build (own harness)", marker="s")
    series(ours_bb, C_OURS_BB, "ours — baseband", z=4)
    series(ours_pb, C_OURS_PB, "ours — passband (effective)", marker="^")

    # direct labels at the right edge, stacked to avoid collisions
    ends = [(ref.get(16), "reference build", C_REF, 19.4),
            (ours_pb.get(16), "ours passband", C_OURS_PB, 17.7),
            (ours_bb.get(16), "ours baseband", C_OURS_BB, 16.0),
            (doc.get(16), "documented", C_DOC, 12.6)]
    for y, txt, c, ytxt in ends:
        if y is not None:
            ax.annotate(txt, (16, y), xytext=(16.35, ytxt), fontsize=8,
                        color=c, va="center")

    ax.set_xlim(-0.5, 19.5)
    ax.set_ylim(-12.5, 21.0)
    ax.set_xticks(cfgs)
    ax.set_xticklabels([str(c) for c in cfgs], color=INK)
    ax.set_xlabel("CONFIG", color=INK)
    ax.set_ylabel("Es/N0 @ FER<0.1  (dB, per-carrier convention)", color=INK)
    ax.set_title("OFDM waterfalls: ours vs reference build vs documented "
                 "table (≥1024 frames/pt at threshold)", color=INK,
                 fontsize=11)
    ax.grid(True, color="#e4e3df", linewidth=0.7, zorder=0)
    for spine in ax.spines.values():
        spine.set_color("#c9c8c2")
    ax.tick_params(colors="#52514e")
    ax.legend(loc="upper left", fontsize=8, framealpha=0.9)
    fig.tight_layout()
    out_path = os.path.join(DOCS, out)
    fig.savefig(out_path, facecolor=SURFACE)
    print("wrote", out_path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
