"""Source-tree fingerprint for quality artifacts (VERDICT r2 weak #8).

The committed QUALITY*/TRACK_QUALITY* JSONs record the hash of the source
trees that produced them; tests/test_quality.py fails when the trees moved
without a re-run, so a stale artifact cannot silently keep passing.
"""

from __future__ import annotations

import hashlib
import os

# every tree whose behavior the quality proofs measure
QUALITY_TREES = ("models", "train", "ops", "tracking", "evaluation.py",
                 "evaluation_mot.py", "data/synthetic.py",
                 "data/training.py")


def quality_tree_hash(package_root: str | None = None) -> str:
    """sha256 over (relpath, bytes) of every .py/.cpp file under
    QUALITY_TREES, sorted — stable across checkouts and platforms."""
    if package_root is None:
        package_root = os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))
    h = hashlib.sha256()
    for entry in QUALITY_TREES:
        path = os.path.join(package_root, entry)
        files = []
        if os.path.isfile(path):
            files = [path]
        else:
            for dirpath, _, names in os.walk(path):
                files += [os.path.join(dirpath, n) for n in names
                          if n.endswith((".py", ".cpp"))]
        for f in sorted(files):
            rel = os.path.relpath(f, package_root)
            h.update(rel.encode())
            with open(f, "rb") as fh:
                h.update(fh.read())
    return h.hexdigest()[:16]
