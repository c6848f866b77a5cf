"""Configuration catalog: datasources + metrics.

Mirrors the reference's ~/.dragnetrc data model
(lib/config-common.js:27-108): named **datasources** (backend path,
data format, time format/field, implicit filter, index path) and
named **metrics** (datasource, filter, breakdowns). CRUD matches the
``dn datasource-*`` / ``dn metric-*`` command family (bin/dn).

Stored as a single JSON file; the default location honors
$DRAGNET_CONFIG (the reference's test-isolation variable).
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field as dc_field
from typing import Any

from dragnet_spark.fieldspec import parse_breakdowns
from dragnet_spark.krill import validate_predicate

CONFIG_VERSION = "0.0.2"  # tracks the reference's config version


class ConfigError(ValueError):
    pass


@dataclass
class DatasourceConfig:
    name: str
    path: str
    backend: str = "file"            # file | parquet | manta (any fs Spark reads)
    data_format: str = "json"        # json | json-skinner | parquet | csv | orc
    index_path: str | None = None
    time_format: str | None = None   # %Y/%m/%d[/%H] subset, for path pruning
    time_field: str | None = None
    filter: Any = None               # implicit krill filter (F2)
    schema: str | None = None        # optional DDL schema (skip inference)

    def __post_init__(self):
        if self.backend not in ("file", "parquet", "manta"):
            raise ConfigError(f"unsupported backend: {self.backend}")
        if self.data_format not in ("json", "json-skinner", "parquet", "csv", "orc"):
            raise ConfigError(f"unsupported data format: {self.data_format}")
        validate_predicate(self.filter)


@dataclass
class MetricConfig:
    name: str
    datasource: str
    breakdowns: list  # list of attr dicts (storable form)
    filter: Any = None

    def __post_init__(self):
        validate_predicate(self.filter)
        parse_breakdowns([dict(b) for b in self.breakdowns])  # validates


def default_config_path() -> str:
    return os.environ.get(
        "DRAGNET_CONFIG", os.path.expanduser("~/.dragnet_spark.json")
    )


@dataclass
class Catalog:
    datasources: dict[str, DatasourceConfig] = dc_field(default_factory=dict)
    metrics: dict[str, MetricConfig] = dc_field(default_factory=dict)
    path: str | None = None  # where this catalog was loaded from

    # -- datasource CRUD (reference: dn datasource-add/-list/-remove/-update)
    def datasource_add(self, ds: DatasourceConfig, update: bool = False) -> None:
        if ds.name in self.datasources and not update:
            raise ConfigError(f'datasource "{ds.name}" already exists')
        self.datasources[ds.name] = ds

    def datasource_remove(self, name: str) -> None:
        if name not in self.datasources:
            raise ConfigError(f'datasource "{name}" does not exist')
        del self.datasources[name]

    def datasource(self, name: str) -> DatasourceConfig:
        if name not in self.datasources:
            raise ConfigError(f'unknown datasource: "{name}"')
        return self.datasources[name]

    # -- metric CRUD (reference: dn metric-add/-list/-remove). Metrics
    # are scoped per datasource (bin/dn:520-572 takes DATASOURCE METRIC
    # argument pairs), so the storage key is "datasource/name".
    @staticmethod
    def _mkey(datasource: str, name: str) -> str:
        return f"{datasource}/{name}"

    def metric_add(self, m: MetricConfig, update: bool = False) -> None:
        key = self._mkey(m.datasource, m.name)
        if key in self.metrics and not update:
            raise ConfigError(f'metric "{m.name}" already exists')
        self.datasource(m.datasource)  # must exist
        self.metrics[key] = m

    def metric_remove(self, datasource: str, name: str) -> None:
        key = self._mkey(datasource, name)
        if key not in self.metrics:
            raise ConfigError(f'metric "{name}" does not exist')
        del self.metrics[key]

    def metrics_for(self, datasource: str) -> list[MetricConfig]:
        return [m for m in self.metrics.values() if m.datasource == datasource]

    # -- persistence
    def save(self, path: str | None = None) -> str:
        path = path or self.path or default_config_path()
        obj = {
            "vers": CONFIG_VERSION,
            "datasources": {k: asdict(v) for k, v in self.datasources.items()},
            "metrics": {k: asdict(v) for k, v in self.metrics.items()},
        }
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(obj, f, indent=2)
        os.replace(tmp, path)  # atomic, like the reference's index writes
        return path

    @staticmethod
    def load(path: str | None = None) -> "Catalog":
        path = path or default_config_path()
        if not os.path.exists(path):
            return Catalog(path=path)
        with open(path) as f:
            obj = json.load(f)
        if not str(obj.get("vers", "")).startswith("0."):
            raise ConfigError(f"unsupported config version: {obj.get('vers')}")
        return Catalog(
            datasources={
                k: DatasourceConfig(**v) for k, v in obj.get("datasources", {}).items()
            },
            metrics={k: MetricConfig(**v) for k, v in obj.get("metrics", {}).items()},
            path=path,
        )
