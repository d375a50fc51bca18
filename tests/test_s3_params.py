"""Per-query S3 credential/endpoint plumbing (Import/Importer.h:76-78,
Archive/S3Archive.cpp). No object store exists in this container, so the
contract under test is conf placement: the S3A connector reads exactly
these Hadoop keys, globally or scoped to one bucket."""

from __future__ import annotations

from compass_query_optimizer_spark.sources.copy_io import (
    S3Params,
    apply_s3_params,
)


def _conf(spark):
    return spark.sparkContext._jsc.hadoopConfiguration()


def test_global_s3_credentials(spark):
    written = apply_s3_params(
        spark,
        S3Params(access_key="AKTEST", secret_key="s3cr3t", region="us-west-2"),
    )
    c = _conf(spark)
    assert c.get("fs.s3a.access.key") == "AKTEST"
    assert c.get("fs.s3a.secret.key") == "s3cr3t"
    assert c.get("fs.s3a.endpoint.region") == "us-west-2"
    assert sorted(written) == [
        "fs.s3a.access.key",
        "fs.s3a.endpoint.region",
        "fs.s3a.secret.key",
    ]


def test_bucket_scoped_override_and_custom_endpoint(spark):
    """Two stores in one session: bucket-scoped keys must not clobber the
    global ones, and MinIO-style endpoints need path-style addressing."""
    apply_s3_params(spark, S3Params(access_key="GLOBAL", secret_key="g"))
    apply_s3_params(
        spark,
        S3Params(
            access_key="MINIO",
            secret_key="m",
            endpoint="http://minio.local:9000",
            path_style=True,
            bucket="lakehouse",
        ),
    )
    c = _conf(spark)
    assert c.get("fs.s3a.access.key") == "GLOBAL"
    assert c.get("fs.s3a.bucket.lakehouse.access.key") == "MINIO"
    assert c.get("fs.s3a.bucket.lakehouse.endpoint") == "http://minio.local:9000"
    assert c.get("fs.s3a.bucket.lakehouse.path.style.access") == "true"


def test_session_token_switches_credential_provider(spark):
    apply_s3_params(
        spark,
        S3Params(
            access_key="AK", secret_key="SK", session_token="tok",
            bucket="temp-creds",
        ),
    )
    c = _conf(spark)
    assert c.get("fs.s3a.bucket.temp-creds.session.token") == "tok"
    assert (
        c.get("fs.s3a.bucket.temp-creds.aws.credentials.provider")
        == "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider"
    )
