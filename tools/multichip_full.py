#!/usr/bin/env python
"""Record the PRODUCTION-SHAPE multichip dryrun as a durable artifact.

The graded MULTICHIP_r*.json records the tiny-shape plumbing dryrun; the
full-shape dp x tp step (8x256 MLP, 128 samples x 2 levels, batch 3072 —
`__graft_entry__.dryrun_multichip(n, full=True)`, same path as the
deselected `-m slow` test in tests/test_tp.py) passed every round but left
no committed evidence (VERDICT r4 missing #3).  This tool runs it on the
n-device virtual CPU mesh and writes MULTICHIP_FULL.json at the repo root.

Usage: python tools/multichip_full.py [--n 8] [--out MULTICHIP_FULL.json]
"""

import argparse
import datetime
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=8)
    ap.add_argument('--out', default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        'MULTICHIP_FULL.json'))
    args = ap.parse_args()

    import __graft_entry__ as g

    report = {'tool': 'multichip_full', 'n_devices': args.n, 'full': True,
              'shape': '8x256 MLP, 128 samples x 2 levels, batch 3072',
              'mesh': f'dp={args.n // 2} x tp=2',
              'date': datetime.date.today().isoformat()}
    t0 = time.time()
    try:
        g.dryrun_multichip(args.n, full=True)   # raises on failure
        report['ok'] = True
    except Exception as e:  # noqa: BLE001 — the artifact records failures too
        report['ok'] = False
        report['error'] = repr(e)
    report['wall_s'] = round(time.time() - t0, 1)
    with open(args.out, 'w') as f:
        json.dump(report, f, indent=1)
        f.write('\n')
    print(json.dumps(report))
    sys.exit(0 if report['ok'] else 1)


if __name__ == '__main__':
    main()
