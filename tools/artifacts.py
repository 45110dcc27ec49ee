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
    record: the file is absent, untracked, or already git-dirty.

    Fails CLOSED when git state cannot be determined (git missing, not
    a repository, any exit code other than diff's documented 0/1): the
    guard exists precisely because no committed history would protect
    the file, so an indeterminate state must refuse, not silently allow
    (ADVICE r13)."""
    if not os.path.exists(path):
        return True
    repo = os.path.dirname(os.path.abspath(path)) or "."
    try:
        r = subprocess.run(
            ["git", "-C", repo, "diff", "--quiet", "HEAD", "--", path],
            capture_output=True,
        )
    except OSError as ex:  # git binary missing
        print(f"artifact_writable: cannot run git ({ex}); refusing to "
              f"overwrite {path} — pass an explicit --out")
        return False
    if r.returncode == 1:
        return True  # dirty vs HEAD: mid-round iteration, fair game
    if r.returncode != 0:  # not a repo / bad HEAD / other git error
        print(f"artifact_writable: git diff failed (rc={r.returncode}, "
              f"{r.stderr.decode(errors='replace').strip()[:120]}); "
              f"refusing to overwrite {path} — pass an explicit --out")
        return False
    # clean vs HEAD — but untracked files also diff clean: writable
    # only if untracked
    ls = subprocess.run(
        ["git", "-C", repo, "ls-files", "--error-unmatch", path],
        capture_output=True,
    )
    return ls.returncode != 0
