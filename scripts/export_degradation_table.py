#!/usr/bin/env python
"""Export an exact AIA degradation table (JSON, data/degradation.py format)
on a host with aiapy installed. The packaged asset
sunerf_tpu/assets/aia_degradation.json is an approximation of the published
V9/V10 trends; run this once with network access and replace it:

  python scripts/export_degradation_table.py --out sunerf_tpu/assets/aia_degradation.json

(Reference parity: ITI's AIAPrepEditor applies the same aiapy correction at
load time, sunerf/data/utils.py:28-51.)
"""
import argparse
import json
from datetime import datetime, timedelta


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--out', required=True)
    parser.add_argument('--start', default='2010-05-01')
    parser.add_argument('--end', default=None, help='default: today')
    parser.add_argument('--step-days', type=int, default=30)
    parser.add_argument('--wavelengths', type=int, nargs='+',
                        default=[94, 131, 171, 193, 211, 304, 335])
    args = parser.parse_args()

    import astropy.units as u
    from aiapy.calibrate import degradation
    from aiapy.calibrate.util import get_correction_table
    from astropy.time import Time

    start = datetime.fromisoformat(args.start)
    end = datetime.fromisoformat(args.end) if args.end else datetime.utcnow()
    times = []
    t = start
    while t <= end:
        times.append(t)
        t += timedelta(days=args.step_days)

    correction_table = get_correction_table()
    table = {}
    astro_times = Time([t.isoformat() for t in times])
    for wl in args.wavelengths:
        factors = degradation(wl * u.angstrom, astro_times,
                              correction_table=correction_table)
        table[str(wl)] = {
            'times': [t.isoformat() for t in times],
            'factors': [float(f) for f in factors.value],
        }
    table['_meta'] = {
        'description': f'aiapy degradation factors exported '
                       f'{datetime.utcnow().isoformat()}',
        'convention': 'corrected = observed / factor',
    }
    with open(args.out, 'w') as f:
        json.dump(table, f, indent=1)
    print(f'wrote {args.out} ({len(times)} epochs, '
          f'{len(args.wavelengths)} channels)')


if __name__ == '__main__':
    main()
