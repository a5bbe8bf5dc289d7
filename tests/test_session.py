"""Session factory behavior (session.py)."""

from __future__ import annotations

import subprocess
import sys

import pytest


@pytest.mark.slow
def test_second_session_in_one_process_gets_its_own_master():
    """Regression: a stopped SparkContext leaves spark.master in the reused
    JVM's system properties; get_spark must still apply the REQUESTED core
    count to the next session (the bug pinned every later session to the
    first session's master, silently serializing scaling benchmarks)."""
    code = (
        "from extremexp_knowledge_graph_spark.session import get_spark\n"
        "s1 = get_spark('leak-a', cpus=2)\n"
        "m1 = s1.sparkContext.master\n"
        "s1.stop()\n"
        "s2 = get_spark('leak-b', cpus=4)\n"
        "m2 = s2.sparkContext.master\n"
        "s2.stop()\n"
        "print('MASTERS', m1, m2)\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        check=True,
        cwd="/root/repo",
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("MASTERS")][-1]
    _, m1, m2 = line.split()
    assert m1 == "local[2]" and m2 == "local[4]", (m1, m2)
