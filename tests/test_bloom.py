"""Bloom semi-join reduction: no false negatives, bounded false positives."""

from pyspark.sql import functions as F

from federated_gcn_spark.operators.bloom import bloom_bits, bloom_prune


def test_bloom_prune_has_no_false_negatives_and_few_false_positives(spark):
    build = spark.range(0, 500).select((F.col("id") * 7).alias("k"))
    probe = spark.range(0, 20000).select(F.col("id").alias("k"))
    bits = bloom_bits(build, "k", n_bits=8192, n_hashes=3)
    passed = {r["k"] for r in bloom_prune(probe, bits, "k", 8192, 3).collect()}
    truth = {r["k"] for r in probe.join(
        build.withColumnRenamed("k", "bk"),
        F.col("k") == F.col("bk"), "left_semi").collect()}
    assert truth <= passed  # never drops a real match
    # 500 keys in 8192 bits / 3 hashes -> expected fp ~ (1-e^-0.183)^3 ~ 0.5%
    fp = (len(passed) - len(truth)) / (20000 - len(truth))
    assert fp < 0.03


def test_bloom_bits_bounded_by_n_bits(spark):
    build = spark.range(0, 100000).select(F.col("id").alias("k"))
    n = bloom_bits(build, "k", n_bits=1024, n_hashes=3).count()
    assert n <= 1024  # filter table is bounded regardless of build size
    assert n > 900  # ...and saturated for this many keys
