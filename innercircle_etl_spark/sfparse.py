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
  factor; the suffix is a human tag, never part of the number. The
  ``_MAX_SF`` plausibility bound applies HERE TOO (round-13 advice
  item 2): a date-stamped dir like ``sf2024_snapshot`` used to parse
  as factor 2024 through this arm and silently arm sf10 demotion —
  the exact failure the parent-level bound was added to prevent. An
  implausible basename number now parses to None, same as any other
  non-fixture name.
* parent (one level up, only when the basename has no sf prefix):
  the same prefix rule, BUT the number must end at a non-alphanumeric
  boundary — so nested renamed fixtures (``sf10-v2/data``,
  ``sf10_perm/data``) keep both the rename tolerance (round-11
  advice) and the demotion arm, while an unrelated ancestor such as
  ``/data/sf2020-era/fixture`` no longer hijacks the label (2020
  fails the bound; the old unbounded prefix match silently armed
  sf10 demotion there).
* anything else -> None; callers must state that no factor parsed
  (the sweep says demotion was NOT considered; the bench labels with
  the raw path) rather than guessing.
"""

from __future__ import annotations

import os
import re

_MAX_SF = 1000.0  # largest plausible fixture factor, both arms;
# testdata tops out at sf10 today and a factor-100 fixture is the
# documented design ceiling — 1000 leaves headroom without admitting
# year-like numbers (2020, 2024)


def parse_sf(sf_dir: str) -> float | None:
    parts = sf_dir.rstrip("/").split(os.sep)
    if not parts:
        return None
    m = re.match(r"sf(\d+(?:\.\d+)?)", parts[-1])
    if m and float(m.group(1)) <= _MAX_SF:
        return float(m.group(1))
    if m:
        return None  # implausible basename factor (sf2024_snapshot):
        # never fall through to the parent — the operator DID name
        # the dir sf<N>; a silent parent parse would be a third arm
    if len(parts) >= 2:
        m = re.match(r"sf(\d+(?:\.\d+)?)(?:$|[^0-9A-Za-z])", parts[-2])
        if m and float(m.group(1)) <= _MAX_SF:
            return float(m.group(1))
    return None
