"""The conftest ResilientSpark proxy survives Spark-session death (r10
verdict #4: one mid-suite JVM loss once cascaded into 73 false failures).

Both tests deliberately kill the SHARED session; the proxy recreates it, so
tests after this module (and these tests' own follow-up actions) run on a
fresh JVM. Runtime cost: two session restarts (~30 s total).
"""

from __future__ import annotations

import os
import signal
import time


def test_recovers_from_clean_context_stop(spark):
    before = spark.recreates
    assert spark.range(5).count() == 5
    spark.sparkContext.stop()  # "SparkContext was shut down" mid-suite
    # next use must detect the stopped context and recreate
    assert spark.range(7).count() == 7
    assert spark.recreates == before + 1


def test_recovers_from_jvm_kill(spark):
    """The real shared-host failure mode: the JVM process dies outright
    (py4j gateway ConnectionRefused on every later call)."""
    before = spark.recreates
    assert spark.range(3).count() == 3
    proc = spark.sparkContext._gateway.proc  # py4j-launched JVM child
    os.kill(proc.pid, signal.SIGKILL)
    deadline = time.time() + 30
    while proc.poll() is None and time.time() < deadline:
        time.sleep(0.2)
    assert proc.poll() is not None, "JVM did not die"
    assert spark.range(11).count() == 11
    assert spark.recreates == before + 1
    # and the recreated session is a fully working engine, not a stub
    assert spark.createDataFrame([(1, "a")], "k int, v string").count() == 1
