"""dns_log_transformer_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference `mciantar/dns-log-transformer` (a Flask micro-service that
transforms AWS Route53 Resolver query logs delivered by Kinesis Data
Firehose into BIND9-format syslog lines; see /root/reference/app/app.py),
widened into a general large-scale analytics engine:

- ``schemas``     — declared StructTypes for the Firehose envelope and the
                    Route53 DNS record (reference app/app.py:35-58,177-192).
- ``transforms``  — pure DataFrame->DataFrame functions for the reference
                    pipeline: envelope parse, base64+JSON decode, structural
                    validation with quarantine, BIND9 / Microsoft-DNS log
                    formatting (reference app/app.py:104-263).
- ``sources``     — batch & streaming readers (Firehose-landing JSON, rate,
                    synthetic generators for tests).
- ``sinks``       — syslog UDP foreach writer (reference app/app.py:17-32),
                    quarantine/dead-letter parquet sink.
- ``streaming``   — Structured Streaming pipeline wiring, event-time
                    windows, watermarks, stateful dedup.
- ``operators``   — LLM-data-pipeline operators: exact/near dedup
                    (MinHash-LSH, SimHash, n-gram Jaccard, embedding),
                    similarity search (brute-force + LSH ANN), text
                    analysis, multimodal column plumbing.
- ``queries``     — the batch analytics surface (joins, aggregations,
                    windows, sorts, set ops) over TPC-H-ish tables.

Everything is DataFrame/SQL-first so Catalyst handles pushdown, pruning,
join strategy and AQE; Python touches data only through Arrow-batched
pandas UDFs where no builtin exists.
"""

__version__ = "0.1.0"
