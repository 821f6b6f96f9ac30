"""Shared example-output recorder.

The reference's committed notebook outputs are its de-facto regression
record (SURVEY.md section 4); these scripts' analog is one JSON line per
run appended to ``examples/results.jsonl`` (committed, refreshed each
round): logz, error, sigma-off-fiducial, wall time and run config.
"""

import json
import os
import time

_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     'results.jsonl')


def record(name, fiducial, res, wall_s, config):
    rec = {
        'example': name,
        'logz': round(float(res.logz), 4),
        'logz_err': round(float(res.logz_err), 4),
        'fiducial': fiducial,
        'sigma_off_fiducial': round(
            abs(float(res.logz) - fiducial) / float(res.logz_err), 2),
        'n_call': int(res.n_call),
        'wall_s': round(wall_s, 1),
        'config': config,
        'date': time.strftime('%Y-%m-%d'),
    }
    with open(_PATH, 'a') as f:
        f.write(json.dumps(rec) + '\n')
    return rec
