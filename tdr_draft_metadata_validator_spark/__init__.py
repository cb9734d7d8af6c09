"""PySpark-native schema + constraint validation engine.

A brand-new engine (NOT a port) with the validation capabilities of
``nationalarchives/tdr-draft-metadata-validator``, re-expressed Spark-first
over tables of audio clip + transcript pairs:

    clips(clip_id string, bytes binary, sr_hz int, dur_ms int,
          codec string, transcript string)

Layout:
    session      -- SparkSession factory tuned for the engine
    models       -- run config / violation / verdict models (ErrorFileData analog)
    datagen      -- deterministic synthetic clips + reference tables (seed=42)
    functions/   -- scalar helpers (audio codecs, text analysis)
    operators/   -- gates, rule compiler, relational checks, stats, dedup, ann
    sources/     -- table readers (parquet / csv / iceberg-behind-import-try)
    plans/       -- the validation plan builder + checkpoint/resume
    pipeline/    -- training-data pipeline ops (dedup, similarity, multimodal)
    streaming/   -- structured-streaming variant of the rule evaluation
"""

__version__ = "0.3.0"
