from __future__ import annotations

import pytest

from aisdb_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def synth(spark):
    from aisdb_spark.sources.transcripts import synth_transcripts

    df = synth_transcripts(spark)
    df.cache().count()
    return df
