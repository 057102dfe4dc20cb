"""Phase timing of the bench louvain_multiblock call (sf0.01, num_blocks=32)."""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
LV_DIR = os.environ.get("LV_DIR", "/root/testdata/sf0.01")

from pyspark.sql import functions as F

from comm_detect_spark.session import get_spark
from comm_detect_spark.operators.louvain import louvain
import __spark_entry__ as entry_mod

spark = get_spark(app_name="debug-louvain", cores=CPUS, shuffle_partitions=CPUS)

for rep in range(3):
    t0 = time.perf_counter()
    sym_g = entry_mod._g_sym(spark, LV_DIR)
    n_g = int(sym_g.agg(F.greatest(F.max("src"), F.max("dst"))).collect()[0][0]) + 1
    t1 = time.perf_counter()
    out, levels = louvain(spark, sym_g, n_g, num_blocks=CPUS, frontier=True)
    cnt = out.count()
    t2 = time.perf_counter()
    print(f"rep{rep}: n={n_g} setup {t1-t0:.3f} louvain {t2-t1:.3f} levels={levels} rows={cnt}", flush=True)
spark.stop()
