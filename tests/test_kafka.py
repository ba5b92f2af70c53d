"""Kafka connector over the real wire protocol, tested against the
in-process MiniKafka broker: CRC32C golden value, RecordBatch-v2
round trips, produce/fetch via the spec's framing, Spark batch +
streaming reads, the producer sink, and corruption refusal."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from introduction_in_big_data_spark.functions import kafkaproto as kp
from introduction_in_big_data_spark.sources import kafka_io as kio
from introduction_in_big_data_spark.sources.kafkabroker import MiniKafka
from introduction_in_big_data_spark.streaming import stream as st


def test_crc32c_golden_and_varint():
    # CRC catalogue check value for CRC-32/ISCSI
    assert kp.crc32c(b"123456789") == 0xE3069283
    assert kp.crc32c(b"") == 0
    for v in (0, 1, -1, 63, -64, 64, 300, -301, 2**31, -(2**31)):
        r = kp.Reader(kp.varint(v))
        assert r.varint() == v, v


def test_record_batch_crc_corruption_refused():
    batch = bytearray(
        kp.encode_record_batch(0, [(b"k", b"v", 12345)])
    )
    batch[-1] ^= 0x01  # flip a bit in the last value byte
    with pytest.raises(ValueError, match="CRC32C"):
        kp.decode_record_set(bytes(batch))


def test_wire_produce_fetch_offsets():
    with MiniKafka(partitions=2) as broker:
        bs = broker.bootstrap
        assert kio.produce(bs, "t", 1, [(None, b"a", 1)]) == 0
        assert kio.produce(bs, "t", 1, [(None, b"b", 2), (None, b"c", 3)]) == 1
        recs, hw = kio.fetch(bs, "t", 1, 1)
        assert hw == 3
        assert [(o, v) for o, _k, v, _t in recs] == [(1, b"b"), (2, b"c")]
        # untouched partition is empty
        assert kio.fetch(bs, "t", 0, 0) == ([], 0)


def test_spark_batch_read_and_sink_roundtrip(spark):
    with MiniKafka(partitions=3) as broker:
        bs = broker.bootstrap
        df = spark.range(0, 90).select(
            F.col("id").cast("string").alias("k"),
            F.concat(F.lit("msg-"), F.col("id")).alias("v"),
        ).repartition(6)
        kio.write_kafka(df, bs, "events", key_col="k", value_col="v")
        back = kio.read_kafka(spark, bs, "events")
        rows = back.collect()
        assert len(rows) == 90
        got = sorted(
            (r.key.decode(), r.value.decode()) for r in rows
        )
        assert got == sorted(
            (str(i), f"msg-{i}") for i in range(90)
        )
        # offsets are dense per partition
        per_part = (
            back.groupBy("partition")
            .agg(F.count(F.lit(1)).alias("n"), F.max("offset").alias("mx"))
            .collect()
        )
        for r in per_part:
            assert r.mx == r.n - 1


def test_streaming_source_matches_batch_and_replays(spark):
    with MiniKafka(partitions=2) as broker:
        bs = broker.bootstrap
        for wave in range(2):  # two produce waves = two offset ranges
            for p in range(2):
                kio.produce(
                    bs, "ticks", p,
                    [
                        (None, f"w{wave}p{p}r{i}".encode(), wave * 100 + i)
                        for i in range(25)
                    ],
                )
        kio.register_kafka_source(spark)
        s = (
            spark.readStream.format("kafka_py")
            .option("bootstrap", bs)
            .option("topic", "ticks")
            .option("startingOffsets", "earliest")
            .load()
        )
        agg = s.groupBy("partition").agg(
            F.count(F.lit(1)).alias("n"),
            F.max("offset").alias("max_off"),
        )
        out = st.run_to_memory(agg, "complete", state_partitions=2)
        got = sorted((r.partition, r.n, r.max_off) for r in out.collect())
        assert got == [(0, 50, 49), (1, 50, 49)]
        # replay determinism: a fresh stream over the immutable log
        # yields the identical row multiset
        s2 = (
            spark.readStream.format("kafka_py")
            .option("bootstrap", bs)
            .option("topic", "ticks")
            .load()
        )
        vals = st.run_to_memory(
            s2.groupBy().agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.crc32(F.col("value"))).alias("vsum"),
            ),
            "complete",
            state_partitions=2,
        ).collect()
        vals2 = st.run_to_memory(
            (
                spark.readStream.format("kafka_py")
                .option("bootstrap", bs)
                .option("topic", "ticks")
                .load()
                .groupBy()
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.crc32(F.col("value"))).alias("vsum"),
                )
            ),
            "complete",
            state_partitions=2,
        ).collect()
        assert [tuple(r) for r in vals] == [tuple(r) for r in vals2]
        assert vals[0].n == 100


def test_stream_reader_offset_contract():
    """The offset contract directly (no stream machinery):
    startingOffsets=latest skips history, (start, end] ranges render
    exactly the in-between records, and empty ranges yield no input
    partitions."""
    from introduction_in_big_data_spark.sources.kafka_io import (
        KafkaStreamReader,
    )

    with MiniKafka(partitions=1) as broker:
        bs = broker.bootstrap
        kio.produce(bs, "t2", 0, [(None, b"old", 1)])
        r = KafkaStreamReader(
            {"bootstrap": bs, "topic": "t2", "startingOffsets": "latest"}
        )
        assert r.initialOffset() == {"0": 1}  # history skipped
        kio.produce(bs, "t2", 0, [(None, b"new", 2), (None, b"newer", 3)])
        assert r.latestOffset() == {"0": 3}
        parts = r.partitions({"0": 1}, {"0": 3})
        rows = list(r.read(parts[0]))
        assert [row[1] for row in rows] == [b"new", b"newer"]
        assert [row[4] for row in rows] == [1, 2]  # offsets
        # sub-range: only the middle record
        rows2 = list(r.read(r.partitions({"0": 1}, {"0": 2})[0]))
        assert [row[1] for row in rows2] == [b"new"]
        assert r.partitions({"0": 3}, {"0": 3}) == []


def test_record_batch_property_roundtrip():
    """Property: arbitrary key/value byte strings (incl. None/empty)
    and timestamps round-trip through RecordBatch v2 encode/decode
    with offsets assigned densely from the base."""
    from hypothesis import given, settings
    from hypothesis import strategies as st_

    rec = st_.tuples(
        st_.one_of(st_.none(), st_.binary(max_size=64)),
        st_.one_of(st_.none(), st_.binary(max_size=256)),
        st_.integers(min_value=0, max_value=2**45),
    )

    @settings(max_examples=60, deadline=None)
    @given(
        st_.lists(rec, min_size=1, max_size=20),
        st_.integers(min_value=0, max_value=2**40),
    )
    def check(records, base):
        out = kp.decode_record_set(kp.encode_record_batch(base, records))
        assert [
            (o, k, v, t) for o, k, v, t in out
        ] == [
            (base + i, k, v, t) for i, (k, v, t) in enumerate(records)
        ]

    check()


def test_varint_property_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st_

    @settings(max_examples=200, deadline=None)
    @given(st_.integers(min_value=-(2**62), max_value=2**62))
    def check(v):
        assert kp.Reader(kp.varint(v)).varint() == v

    check()


def test_streaming_into_kafka_foreachbatch(spark, tmp_path):
    """Kafka as a STREAMING SINK: a file stream drains into the
    broker via foreachBatch(write_kafka), and the topic's content
    equals the staged input — the write half of the queue round
    trip."""
    base = spark.range(0, 120).select(
        F.col("id").alias("k"), F.concat(F.lit("m"), F.col("id")).alias("m")
    )
    src = str(tmp_path / "in")
    base.repartitionByRange(4, "k").write.parquet(src)
    with MiniKafka(partitions=2) as broker:
        bs = broker.bootstrap
        stream = (
            spark.readStream.schema("k long, m string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda df, _id: kio.write_kafka(
                    df, bs, "out", key_col="k", value_col="m"
                )
            )
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination()
        back = kio.read_kafka(spark, bs, "out")
        got = sorted(
            (int(r.key.decode()), r.value.decode()) for r in back.collect()
        )
        assert got == [(i, f"m{i}") for i in range(120)]


def test_partial_trailing_batch_tolerated():
    """The wire legally truncates the LAST batch in a fetch response
    at max_bytes; the decoder must return the complete batches and
    ignore the partial tail (consumers re-fetch from the next
    offset)."""
    b1 = kp.encode_record_batch(0, [(None, b"a", 1), (None, b"b", 2)])
    b2 = kp.encode_record_batch(2, [(None, b"c", 3)])
    whole = b1 + b2
    # cut inside the second batch
    cut = whole[: len(b1) + 13]
    out = kp.decode_record_set(cut)
    assert [(o, v) for o, _k, v, _t in out] == [(0, b"a"), (1, b"b")]
    assert len(kp.decode_record_set(whole)) == 3
