"""Round-end gate-artifact write guard (VERDICT r12 #8).

The checked-in gate records (SWEEP_DETAIL_<sf>.json,
BENCH_DETAIL_latest.json) are round-end evidence; an ad-hoc
verification run by a judge or builder must not silently clobber them.
Policy: a *committed, git-clean* artifact is only overwritten when the
caller passes an explicit output path; a dirty, untracked, or absent
file is fair game (mid-round iteration).
"""

from __future__ import annotations

import os
import subprocess


def artifact_writable(path: str) -> bool:
    """True when writing ``path`` cannot clobber a committed round-end
    record: the file is absent, untracked, or already git-dirty."""
    if not os.path.exists(path):
        return True
    repo = os.path.dirname(os.path.abspath(path)) or "."
    r = subprocess.run(
        ["git", "-C", repo, "diff", "--quiet", "HEAD", "--", path],
        capture_output=True,
    )
    # 0 = clean vs HEAD; anything else (dirty, git error) -> writable.
    if r.returncode != 0:
        return True
    # untracked files also diff clean vs HEAD — check they're tracked
    ls = subprocess.run(
        ["git", "-C", repo, "ls-files", "--error-unmatch", path],
        capture_output=True,
    )
    return ls.returncode != 0
