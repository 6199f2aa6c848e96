"""Experiment: find bit-exact Spark<->DuckDB recipes for float math."""
import duckdb
from pyspark.sql import SparkSession, functions as F

SF = "/root/testdata/sf0.001"
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
con = duckdb.connect()
con.sql(f"create view embeddings as select * from '{SF}/embeddings.parquet'")
con.sql(f"create view lineitem as select * from '{SF}/lineitem.parquet'")

emb = spark.read.parquet(f"{SF}/embeddings.parquet")

# --- 1. dot product: query vec = embedding of vec_id 0, scored against all
# Spark: sequential double fold over zip_with product
q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
scored = (emb.crossJoin(F.broadcast(q))
    .select("vec_id",
        F.aggregate(F.zip_with("embedding", "qv", lambda a, b: a.cast("double") * b.cast("double")),
                    F.lit(0.0).cast("double"), lambda acc, x: acc + x).alias("score")))
sp = {r["vec_id"]: r["score"] for r in scored.collect()}

# DuckDB variant A: list_reduce fold on double-cast products
dk = con.sql("""
 with q as (select embedding qv from embeddings where vec_id=0)
 select vec_id, list_reduce(list_transform(embedding, (x,i) -> x::double * qv[i]::double), (a,b)->a+b)::double s
 from embeddings, q
""").fetchall()
mismA = sum(1 for vid, s in dk if sp[vid] != s)
print("dot fold list_reduce exact mismatches:", mismA, "/", len(dk))

# DuckDB variant B: parallel unnest sum
dkb = con.sql("""
 with q as (select embedding qv from embeddings where vec_id=0)
 select e.vec_id, (select sum(x::double*y::double) from (select unnest(e.embedding) x, unnest(q.qv) y))::double s
 from embeddings e, q
""").fetchall()
mismB = sum(1 for vid, s in dkb if sp[vid] != s)
print("dot unnest-sum exact mismatches:", mismB, "/", len(dkb))

# --- 2. rounded to 6
import math
mismR = sum(1 for vid, s in dk if round(sp[vid],6) != round(s,6))
print("round6 mismatches:", mismR)

# --- 3. decimal sum parity on lineitem revenue
li = spark.read.parquet(f"{SF}/lineitem.parquet")
sp_rev = (li.groupBy("l_returnflag")
    .agg(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,6)")).alias("rev"))
    ).collect()
sp_rev = {r["l_returnflag"]: str(r["rev"]) for r in sp_rev}
dk_rev = con.sql("select l_returnflag, sum(cast(l_extendedprice*(1-l_discount) as decimal(38,6))) from lineitem group by 1").fetchall()
print("decimal sum:", all(sp_rev[k] == str(v) for k, v in dk_rev), sp_rev)

# --- 4. double sum parity (is it even a problem?)
sp_d = {r["l_returnflag"]: r["rev"] for r in li.groupBy("l_returnflag").agg(F.sum(F.col("l_extendedprice")*(1-F.col("l_discount"))).alias("rev")).collect()}
dk_d = con.sql("select l_returnflag, sum(l_extendedprice*(1-l_discount)) from lineitem group by 1").fetchall()
for k, v in dk_d:
    print("double sum", k, sp_d[k] == v, sp_d[k], v)

# --- 5. md5 + hex->bigint parity
sp_h = spark.sql("select cast(conv(substring(md5('hello world'),1,15),16,10) as bigint) h, md5('hello') m").collect()[0]
dk_h = con.sql("select ('0x'||substr(md5('hello world'),1,15))::bigint h, md5('hello') m").fetchall()[0]
print("md5/hex parity:", sp_h["h"] == dk_h[0], sp_h["m"] == dk_h[1])

# --- 6. round() on double: half cases
sp_r = spark.sql("select round(cast(0.125 as double),2) a, round(cast(2.675 as double),2) b, round(cast(-0.125 as double),2) c").collect()[0]
dk_r = con.sql("select round(0.125::double,2) a, round(2.675::double,2) b, round(-0.125::double,2) c").fetchall()[0]
print("round double:", tuple(sp_r), dk_r)
spark.stop()
