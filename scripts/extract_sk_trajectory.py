#!/usr/bin/env python
"""Extract the SK trajectory from a campaign train.log.

Prints one line per SK step — iter, nmi_vs_gt, anmi, nmi_vs_old,
sk_cost — plus a compact python list of nmi_vs_gt for BASELINE.md rows.

Usage: python scripts/extract_sk_trajectory.py <train.log> [train.log ...]
(multiple logs are concatenated in order — requeued campaigns append to
the same file, so usually one arg)
"""

import ast
import re
import sys


def main():
    steps = {}
    for path in sys.argv[1:]:
        for line in open(path, errors="replace"):
            m = re.search(r"SK step @ iter (\d+): (\{.*\})", line)
            if m:
                d = ast.literal_eval(m.group(2))
                steps[int(m.group(1))] = d
    for it in sorted(steps):
        d = steps[it]
        print(
            f"SK{it}: nmi_vs_gt {d['nmi_vs_gt']:.4f}  "
            f"anmi {d['anmi_vs_gt']:.4f}  nmi_vs_old {d['nmi_vs_old']:.4f}"
            f"  cost {d['sk_cost']:.3f}  sk_time {d.get('sk_time', 0):.0f}s"
        )
    traj = [round(steps[it]["nmi_vs_gt"], 3) for it in sorted(steps)]
    print(f"\nnmi_vs_gt trajectory ({len(traj)} steps): {traj}")


if __name__ == "__main__":
    main()
