"""S4 Kafka loader: pump a CSV file into a topic, line = record value.

Counterpart of the reference's producer
(DW-Flink/HotItemsAnalysis/.../app/KafkaProducer.scala:19-32), which reads
``file/UserBehaviors.csv`` line-by-line and sends each line as a string
record to topic ``hotitems`` on ``localhost:9092``.

Spark-first re-expression: read the CSV as a one-column DataFrame of raw
lines, shape it with ``to_kafka_records`` (the same CSV value format), and
write with the batch Kafka sink — distributed, so a 100 TB backfill fans out
across executors instead of a single driver-side producer loop. Requires the
spark-sql-kafka connector jar (present on real clusters; this container has
none — `tests/test_streaming.py` proves the path up to connector
resolution).

Usage: python tools/kafka_load.py <csv_path> <topic> [bootstrap=localhost:9092]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import DataFrame  # noqa: E402


def load_csv_to_kafka(
    spark, csv_path: str, topic: str, bootstrap: str = "localhost:9092"
) -> None:
    """Write each CSV line as a Kafka record value (reference line format)."""
    lines = spark.read.text(csv_path)  # one `value` string column per line
    shape_kafka_lines(lines).write.format("kafka").option(
        "kafka.bootstrap.servers", bootstrap
    ).option("topic", topic).save()


def shape_kafka_lines(lines: DataFrame) -> DataFrame:
    """The record shaping alone (unit-testable without a broker): raw text
    lines already ARE the CSV value payload, matching the reference's
    line-per-record send."""
    from data_warehouse_flink_spark.sources.sinks import to_kafka_records

    return to_kafka_records(lines, ["value"])


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    csv_path, topic = sys.argv[1], sys.argv[2]
    bootstrap = sys.argv[3] if len(sys.argv) > 3 else "localhost:9092"

    from data_warehouse_flink_spark.session import get_spark

    spark = get_spark("kafka-load")
    load_csv_to_kafka(spark, csv_path, topic, bootstrap)
    spark.stop()


if __name__ == "__main__":
    main()
