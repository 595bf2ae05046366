"""Engine configuration (reference config.py:16-82 parity, Spark-free).

Env-driven config with: ``.env`` file loading, a JSON-valued env var for
the hostname map (config.py:28-33), required-key validation
(config.py:47-60), and secret redaction in ``to_dict`` (config.py:62-82).
"""

from __future__ import annotations

import json
import os
from typing import Any

_SECRET_MARKERS = ("TOKEN", "SECRET", "PASSWORD", "KEY", "SAS")


def load_dotenv(path: str = ".env") -> dict[str, str]:
    """Minimal .env loader: KEY=VALUE lines, #-comments, no interpolation.
    Values already present in the environment win (parity with dotenv)."""
    loaded: dict[str, str] = {}
    if not os.path.exists(path):
        return loaded
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            k, _, v = line.partition("=")
            k, v = k.strip(), v.strip().strip("'\"")
            if k and k not in os.environ:
                os.environ[k] = v
                loaded[k] = v
    return loaded


class Config:
    """Key-value config with validation + redaction (config.py parity)."""

    REQUIRED: tuple[str, ...] = ()

    def __init__(
        self,
        env: dict[str, str] | None = None,
        dotenv_path: str | None = ".env",
        required: tuple[str, ...] | None = None,
    ):
        if dotenv_path:
            load_dotenv(dotenv_path)
        src = env if env is not None else os.environ
        self.databricks_host = src.get("DATABRICKS_HOST", "")
        self.databricks_token = src.get("DATABRICKS_TOKEN", "")
        self.azure_storage_connection_string = src.get(
            "AZURE_STORAGE_CONNECTION_STRING", ""
        )
        self.pg_user = src.get("PG_USER", "")
        self.pg_database = src.get("PG_DATABASE", "")
        # JSON-valued hostname map (config.py:28-33): instance → hostname.
        raw_map = src.get("PG_HOSTNAME_MAP", "{}")
        try:
            self.pg_hostname_map: dict[str, str] = json.loads(raw_map)
        except json.JSONDecodeError:
            self.pg_hostname_map = {}
        self.required = required if required is not None else self.REQUIRED
        self._extra = {
            k: v for k, v in src.items() if k.startswith("SPARK_GRAFT_")
        }

    def get_pg_hostname(self, instance: str) -> str:
        """Hostname-map lookup with instance-name fallback (config.py:40-45)."""
        return self.pg_hostname_map.get(instance, instance)

    def validate(self) -> list[str]:
        """Return missing required keys (config.py:47-60 raises; we report
        so callers choose — the CLI raises, the library warns)."""
        return [k for k in self.required if not getattr(self, k.lower(), "")]

    def to_dict(self, redact: bool = True) -> dict[str, Any]:
        """Dict view with secrets redacted (config.py:62-82)."""
        out: dict[str, Any] = {
            "databricks_host": self.databricks_host,
            "databricks_token": self.databricks_token,
            "azure_storage_connection_string": self.azure_storage_connection_string,
            "pg_user": self.pg_user,
            "pg_database": self.pg_database,
            "pg_hostname_map": self.pg_hostname_map,
            **self._extra,
        }
        if redact:
            for k in list(out):
                if any(m in k.upper() for m in _SECRET_MARKERS) and out[k]:
                    out[k] = "***REDACTED***"
        return out
