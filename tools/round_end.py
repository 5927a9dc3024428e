"""Mechanical round-end step — run ONCE at the end of every round, at
the commit the driver will evaluate.

Three rounds running (r11-r13) the verdict's #1 item was the same
hygiene debt: the round's CORRECTNESS/BENCH artifacts and the
matrix-rotation snapshot were left for the next round, so a fresh
``order`` conservatively re-queued dozens of green-but-unsnapshotted
rows and burned the next round's driver matrix on re-verifies. This
script makes the step un-skippable by making it one command:

    python tools/round_end.py <round>

It (1) snapshots the current query hashes as round ``<round>``
(``tools/matrix_rotation.py snapshot``), (2) regenerates the matrix
order file, (3) stages the snapshot + order + any ``CORRECTNESS_r*``/
``BENCH_r*``/``BENCH_DETAIL_r*`` artifacts sitting untracked or
modified at the repo root, and (4) commits with a standard message —
unless ``--no-commit`` is given, in which case it stops after staging
and prints the commit command.

Safe to re-run: snapshotting the same round twice overwrites with
identical hashes if nothing changed, and the commit is skipped when
the stage is empty.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*cmd: str) -> str:
    return subprocess.run(cmd, cwd=REPO, check=True,
                          capture_output=True, text=True).stdout


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--no-commit"]
    no_commit = "--no-commit" in sys.argv[1:]
    if len(args) != 1 or not args[0].isdigit():
        print(__doc__)
        return 2
    rnd = int(args[0])

    mr = os.path.join(REPO, "tools", "matrix_rotation.py")
    subprocess.run([sys.executable, mr, "snapshot", str(rnd)],
                   cwd=REPO, check=True)
    subprocess.run([sys.executable, mr, "order"], cwd=REPO, check=True)

    to_stage = [
        "tools/query_hashes.json",
        "distributed_computing_projects_spark/queries/_matrix_first.py",
    ]
    artifact_re = re.compile(
        rf"(CORRECTNESS|BENCH|BENCH_DETAIL)_r0*{rnd}\.json$")
    for f in os.listdir(REPO):
        if artifact_re.fullmatch(f):
            to_stage.append(f)
    _run("git", "add", *to_stage)

    staged = _run("git", "diff", "--cached", "--name-only").strip()
    if not staged:
        print("nothing to commit — round-end state already banked")
        return 0
    print("staged:\n" + staged)
    if no_commit:
        print(f'next: git commit -m "round {rnd}: snapshot + artifacts"')
        return 0
    _run("git", "commit", "-m",
         f"Bank round {rnd} snapshot and driver artifacts")
    print(_run("git", "log", "--oneline", "-1").strip())
    return 0


if __name__ == "__main__":
    sys.exit(main())
