"""Shared fixtures: one SparkSession, one fixture corpus, one oracle run."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from locality_sensitive_hashing_spark.config import DEFAULT_CONFIG
from locality_sensitive_hashing_spark.fixtures import make_clips
from locality_sensitive_hashing_spark.oracle import run_oracle
from locality_sensitive_hashing_spark.session import get_spark
from locality_sensitive_hashing_spark.sources.tables import CLIPS_SCHEMA, TableIO

CORPUS_ROWS = 150


@pytest.fixture(scope="session")
def spark():
    s = get_spark("local[8]", app_name="lsh-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def cfg():
    return DEFAULT_CONFIG


@pytest.fixture(scope="session")
def corpus(cfg):
    """(clips_pd, planted_pd, oracle_result) -- generated once per session."""
    clips_pd, planted = make_clips(CORPUS_ROWS, seed=42)
    return clips_pd, planted, run_oracle(clips_pd, cfg)


@pytest.fixture(scope="session")
def clips_df(spark, corpus):
    clips_pd, _, _ = corpus
    return spark.createDataFrame(clips_pd, schema=CLIPS_SCHEMA).cache()


@pytest.fixture(scope="session")
def pipeline_run(spark, cfg, clips_df):
    """One full pipeline execution shared by parity/resume/metrics tests.

    Yields (io, pipeline, clusters_df); the TableIO dir survives the whole
    session so resume tests can re-enter it.
    """
    from locality_sensitive_hashing_spark.plans.pipeline import DedupPipeline

    tmp = tempfile.mkdtemp(prefix="lsh_pipe_")
    io = TableIO(spark, tmp)
    pipe = DedupPipeline(spark, cfg, io, run_id="test-run-1")
    clusters = pipe.run(clips_df)
    yield io, pipe, clusters
    shutil.rmtree(tmp, ignore_errors=True)
