import pytest

from bzzz_spark.fixtures import synth_transcripts_pdf, to_spark
from bzzz_spark.oracle.pyoracle import PyIndex
from bzzz_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    return get_spark("bzzz-tests", cpus=4, shuffle_partitions=4)


@pytest.fixture(scope="session")
def small_pdf():
    return synth_transcripts_pdf(n_conv=30, seed=42)


@pytest.fixture(scope="session")
def small_transcripts(spark, small_pdf):
    return to_spark(spark, small_pdf)


@pytest.fixture(scope="session")
def small_oracle(small_pdf):
    return PyIndex(small_pdf.to_dict("records"))


@pytest.fixture(scope="session")
def small_index(spark, small_transcripts):
    from bzzz_spark.build.indexer import IndexConfig, build_index

    # tiny segments + blocks so segmentation/blocking paths are exercised
    idx = build_index(
        small_transcripts,
        IndexConfig(block_size=16, segment_size=64, num_partitions=4),
    )
    idx.postings.cache().count()
    idx.docs.cache().count()
    return idx
