import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = SparkSession.builder.master("local[16]").config("spark.ui.enabled","false").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as m
q, o = m.queries(), m.oracle_sql()
from iceberg_catalog_postgres_spark.oracle import duckdb_connection, compare
con = duckdb_connection("/root/testdata/sf0.01")
names = sys.argv[1:]
for name in names:
    sdf = q[name](spark, "/root/testdata/sf0.01").toPandas()
    odf = con.execute(o[name]).fetchdf()
    r = compare(name, sdf, odf)
    print(name, r)
