"""View-cache lifetime (views.py _VIEW_CACHE).

The memo must key on the Spark applicationId: a stopped session's
Python object address can be reused, and an id()-keyed memo would then
return DataFrames bound to a dead SparkContext. The restart test runs
in a subprocess because it must tear down and rebuild the JVM-side
context, which would kill the shared session fixture.
"""

from __future__ import annotations

import subprocess
import sys

RESTART_SCRIPT = """
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from cs686_big_data_p1_spark.views import chunks_df, _VIEW_CACHE

s1 = SparkSession.builder.master("local[2]").getOrCreate()
n1 = chunks_df(s1, "/root/testdata/sf0.001").count()
app1 = s1.sparkContext.applicationId
s1.stop()

s2 = SparkSession.builder.master("local[2]").getOrCreate()
app2 = s2.sparkContext.applicationId
assert app1 != app2, "restart must produce a fresh applicationId"
n2 = chunks_df(s2, "/root/testdata/sf0.001").count()
assert n1 == n2 and n1 > 0, (n1, n2)
assert any(k[0] == app2 for k in _VIEW_CACHE), "no entry for new session"
print("RESTART-OK", n1)
"""


def test_view_cache_survives_session_restart():
    out = subprocess.run(
        [sys.executable, "-c", RESTART_SCRIPT],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "RESTART-OK" in out.stdout, out.stderr[-2000:]
