"""The ONE scale-factor parser for fixture paths.

bench.py (artifact ``sf`` label) and tools/sf1_spot_sweep.py (sf10
demotion decision) both need "what scale factor is this fixture
dir?" — two private copies drifted (round-12 advice: for
``/x/sf10/data`` the sweep parsed 10 and applied demotion while the
bench labeled the artifact with the raw path string). This module is
the single implementation both import, so the demotion decision and
the artifact label can never disagree again.

Rules (tightened per the round-12 advice's second finding):

* basename: a ``sf<number>`` PREFIX matches — renamed fixtures
  (``sf10-v2``, ``sf10_perm``, a symlink named ``sf10``) keep their
  factor; the suffix is a human tag, never part of the number.
* parent (one level up, only when the basename has no sf prefix):
  the component must be EXACTLY ``sf<number>`` — nested layouts like
  ``sf10/data`` parse, but an unrelated ancestor such as
  ``/data/sf2020-era/fixture`` no longer hijacks the label (the old
  prefix match at the parent level silently triggered sf10 demotion
  there).
* anything else -> None; callers must state that no factor parsed
  (the sweep says demotion was NOT considered; the bench labels with
  the raw path) rather than guessing.
"""

from __future__ import annotations

import os
import re


def parse_sf(sf_dir: str) -> float | None:
    parts = sf_dir.rstrip("/").split(os.sep)
    if not parts:
        return None
    m = re.match(r"sf(\d+(?:\.\d+)?)", parts[-1])
    if m:
        return float(m.group(1))
    if len(parts) >= 2:
        m = re.fullmatch(r"sf(\d+(?:\.\d+)?)", parts[-2])
        if m:
            return float(m.group(1))
    return None
