"""Unity Catalog REST client (reference A2-A4, delta-unity-duckdb.js:120-248).

Resolves a 3-part ``catalog.schema.table`` name to storage metadata and
mints short-lived credentials, then injects them into the Spark session's
Hadoop configuration so executors can read the table's cloud path directly:

1. ``get_table_info``  — GET /api/2.1/unity-catalog/tables/{full_name}
   (js:132-150): table_id + storage_location.
2. ``generate_temp_credentials`` — POST
   /api/2.1/unity-catalog/temporary-table-credentials (js:169-191):
   short-lived Azure SAS / AWS keys, with expiry.
3. ``configure_spark_credentials`` — the reference registers one global
   DuckDB SECRET replaced per table (js:235-241), a correctness hazard for
   concurrent tables (SURVEY.md §4); here credentials are scoped
   **per storage account** via distinct Hadoop conf keys, so concurrent
   tables on different accounts never clobber each other.

Credentials are cached until ~60s before expiry (the reference re-runs the
full REST dance per call — js:277-294 — an inefficiency SURVEY.md §4 flags).

Pure stdlib HTTP (urllib) with an injectable transport for tests — no live
workspace exists in this environment, so the unit tests mock the transport
(SURVEY.md §7.7 risk 5).
"""

from __future__ import annotations

import json
import re
import time
import urllib.request
from typing import Any, Callable

from pyspark.sql import SparkSession

Transport = Callable[[str, str, dict[str, str], bytes | None], dict[str, Any]]


def _default_transport(
    method: str, url: str, headers: dict[str, str], body: bytes | None
) -> dict[str, Any]:
    req = urllib.request.Request(url, data=body, headers=headers, method=method)
    with urllib.request.urlopen(req, timeout=30) as resp:  # noqa: S310
        return json.loads(resp.read().decode())


class UnityCatalogClient:
    def __init__(
        self,
        host: str,
        token: str,
        transport: Transport | None = None,
        refresh_margin_s: int = 60,
    ):
        self.host = host.rstrip("/")
        self.token = token
        self._transport = transport or _default_transport
        self._margin = refresh_margin_s
        # cache: full_name -> (info, credentials, expiry_epoch_ms)
        self._cache: dict[str, tuple[dict, dict, int]] = {}

    def _call(self, method: str, path: str, payload: dict | None = None) -> dict:
        headers = {
            "Authorization": f"Bearer {self.token}",
            "Content-Type": "application/json",
        }
        body = json.dumps(payload).encode() if payload is not None else None
        return self._transport(method, f"{self.host}{path}", headers, body)

    def get_table_info(self, full_name: str) -> dict[str, Any]:
        """3-part name → {table_id, storage_location, …} (js:132-150)."""
        if not re.fullmatch(r"[\w-]+\.[\w-]+\.[\w-]+", full_name):
            raise ValueError(f"not a catalog.schema.table name: {full_name!r}")
        return self._call(
            "GET", f"/api/2.1/unity-catalog/tables/{full_name}"
        )

    def generate_temp_credentials(
        self, table_id: str, operation: str = "READ"
    ) -> dict[str, Any]:
        """table_id → short-lived storage credentials (js:169-191)."""
        return self._call(
            "POST",
            "/api/2.1/unity-catalog/temporary-table-credentials",
            {"table_id": table_id, "operation": operation},
        )

    def resolve(self, full_name: str) -> tuple[dict, dict]:
        """(table_info, credentials) with expiry-aware caching."""
        now_ms = int(time.time() * 1000)
        hit = self._cache.get(full_name)
        if hit and hit[2] - self._margin * 1000 > now_ms:
            return hit[0], hit[1]
        info = self.get_table_info(full_name)
        creds = self.generate_temp_credentials(info["table_id"])
        expiry = int(creds.get("expiration_time", now_ms + 15 * 60 * 1000))
        self._cache[full_name] = (info, creds, expiry)
        return info, creds

    @staticmethod
    def storage_account_of(url: str) -> str | None:
        """abfss://container@account.dfs.core.windows.net/… → account
        (js:196-201 URL parsing)."""
        m = re.match(r"abfss://[^@]+@([^.]+)\.dfs\.core\.windows\.net", url)
        return m.group(1) if m else None

    def configure_spark_credentials(
        self, spark: SparkSession, full_name: str
    ) -> str:
        """Resolve + inject per-account SAS into Hadoop conf; returns the
        table's storage location. Replaces the reference's single global
        secret (js:235-241) with per-account scoping."""
        info, creds = self.resolve(full_name)
        location = info.get("storage_location", "")
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        account = self.storage_account_of(location)
        if account and "azure_user_delegation_sas" in creds:
            sas = creds["azure_user_delegation_sas"]["sas_token"]
            suffix = f"{account}.dfs.core.windows.net"
            hconf.set(f"fs.azure.account.auth.type.{suffix}", "SAS")
            hconf.set(
                f"fs.azure.sas.token.provider.type.{suffix}",
                "org.apache.hadoop.fs.azurebfs.sas.FixedSASTokenProvider",
            )
            hconf.set(f"fs.azure.sas.fixed.token.{suffix}", sas)
        elif "aws_temp_credentials" in creds:
            aws = creds["aws_temp_credentials"]
            bucket = re.match(r"s3a?://([^/]+)", location)
            scope = f".bucket.{bucket.group(1)}" if bucket else ""
            hconf.set(f"fs.s3a{scope}.access.key", aws["access_key_id"])
            hconf.set(f"fs.s3a{scope}.secret.key", aws["secret_access_key"])
            hconf.set(f"fs.s3a{scope}.session.token", aws["session_token"])
            hconf.set(
                f"fs.s3a{scope}.aws.credentials.provider",
                "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider",
            )
        return location

    def read_table(self, spark: SparkSession, full_name: str):
        """End-to-end: resolve name → inject creds → Delta DataFrame
        (the whole §3.1 pipeline as one call, minus the subprocess)."""
        location = self.configure_spark_credentials(spark, full_name)
        return spark.read.format("delta").load(location)
