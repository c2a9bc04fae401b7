"""[EXT] multimodal plumbing + sessionization + sliding windows:
DuckDB oracle parity and plan shape (no shuffle in the decode path)."""

from __future__ import annotations

import pytest

from go_mailio_diskusage_handler_spark import plans, registry
from go_mailio_diskusage_handler_spark.operators import multimodal
from go_mailio_diskusage_handler_spark.sources.tables import load_table

from conftest import SF_CORRECT, compare_with_oracle

ORACLE_CHECKED = [
    "media_metadata",
    "media_decode_features",
    "media_frame_sample",
    "media_resize",
    "media_audio_chunks",
    "events_sessionize",
    "events_sliding_window",
]


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_oracle_parity(spark, ddb, name):
    compare_with_oracle(spark, ddb, name, registry.QUERIES, registry.ORACLE_SQL)


def test_decode_path_has_no_shuffle(spark):
    """mapInPandas decode is embarrassingly parallel — the physical plan
    must contain zero exchanges (payloads never cross the network)."""
    df = multimodal.decode_features(load_table(spark, SF_CORRECT, "documents"))
    assert plans.shuffle_count(df) == 0, plans.executed_plan(df)


def test_decode_media_real_codecs_stubbed(spark):
    docs = load_table(spark, SF_CORRECT, "documents")
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(docs, real_codecs=True)
