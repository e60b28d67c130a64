"""Point git at the tracked .githooks/ dir (one-time per clone).

Usage: python tools/install_hooks.py
"""

import os
import stat
import subprocess

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    hook = os.path.join(_REPO, ".githooks", "pre-commit")
    os.chmod(hook, os.stat(hook).st_mode | stat.S_IXUSR | stat.S_IXGRP
             | stat.S_IXOTH)
    subprocess.run(["git", "config", "core.hooksPath", ".githooks"],
                   cwd=_REPO, check=True)
    print("[hooks] core.hooksPath -> .githooks (pre-commit manifest gate "
          "active)")


if __name__ == "__main__":
    main()
