"""Regenerate the README performance table from sweep_results.json.

Keeps the README and the recorded sweep mechanically in sync (round-2
VERDICT item 10: the two must never drift).  Prints the markdown rows;
paste over the table body in README.md after re-recording the sweep.

    python benchmarks/readme_table.py
"""
import json
from pathlib import Path

HERE = Path(__file__).resolve().parent
ROWS = [
    ("720p_full_search", "720p IPPP, full search ±8 (headline)"),
    ("720p_full_search_sr16", "720p IPPP, full search ±16"),
    ("720p_vbs_fme", "720p + VBS + half-pel FME"),
    ("720p_fast_me", "720p fast-ME (sr16)"),
    ("720p_fast_me_vbs_fme", "720p fast-ME + VBS + FME"),
    ("720p_nref4", "720p nref=4"),
    ("720p_rc_row_qp", "720p RC-active (per-row QP)"),
    ("720p_two_pass", "720p two-pass RC (clip-level)"),
    ("1080p_full_search", "1080p IPPP, full search ±8"),
    ("1080p_vbs_fme", "1080p + VBS + FME"),
    ("4k_full_search", "4K IPPP, full search ±8"),
    ("4k_vbs_fme", "4K + VBS + FME"),
    ("cif_reference_defaults",
     "CIF at the reference's ACTUAL defaults (qp5, gop21, sr16, fast-ME+VBS+FME)"),
    ("720p_decode", "720p decode (input-chained, XLA-gather step)"),
    ("720p_decode_pallas", "720p decode (input-chained, Pallas fetch)"),
    ("720p_decode_vbs_fme_pallas", "720p decode + VBS + FME (input-chained, Pallas fetch)"),
    ("4k_decode_vbs_fme_pallas", "4K decode + VBS + FME (input-chained, Pallas fetch)"),
]


def main():
    d = json.loads((HERE / "sweep_results.json").read_text())
    print("| Config | fps (best / mean) |")
    print("|---|---|")
    for key, label in ROWS:
        r = d.get(key)
        if not r:
            print(f"| {label} | (no `{key}` row recorded) |")
            continue
        best = r.get("fps")
        mean = r.get("mean_fps")
        if key == "cif_reference_defaults":
            base = json.loads((HERE / "reference_baseline.json").read_text())
            ref = base.get("cif_reference_defaults", {}).get("fps")
            ratio = f" (reference itself: {ref:.1f} → **{best / ref:.0f}×**)" if ref else ""
            print(f"| {label} | ~{best:.0f}{ratio} |")
        else:
            print(f"| {label} | ~{best:.0f} / {mean:.0f} |")


if __name__ == "__main__":
    main()
