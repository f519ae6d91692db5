"""Replication config DSL — the JSON_MAPPING tree as dataclasses.

Mirrors the reference's declarative per-run spec (case classes
CQLReplicator.scala K:74-110, parquet P:63-73, dynamodb D:82-104,
opensearch O:71-90) and the *validating resolver* from
PrimaryKeyReconciliation R:127-279, which is the strictest of the four:
  * transformation rule must be in the whitelist
  * duplicate transform target columns are an error
  * keepSource=true requires an alias (else the source column would be
    silently clobbered)
  * effective primary key = declared PK with transformed columns
    renamed to their alias (R:265-277)

The config drives DataFrame pipeline construction; there is no other
"query language" in the reference.
"""

from __future__ import annotations

import base64
import json
from dataclasses import dataclass, field

# Rule whitelist (R:51-74). The reference's DataFrame-side dispatcher
# uses Spark builtins; we standardize on them too ('murmur' = Spark
# hash(), deliberately NOT Scala MurmurHash3.stringHash — R:66 already
# makes this call).
TRANSFORM_RULES = ("md5", "sha1", "sha256", "murmur", "xxhash64")


@dataclass
class PointInTime:
    enabled: bool = False
    predicateOp: str = "greaterThan"  # greaterThan | lessThan | equal (P:1511-1523)
    timestamp: int = 0  # epoch micros, matches writetime units


@dataclass
class Transformation:
    column: str
    rule: str
    alias: str | None = None
    keepSource: bool = False


@dataclass
class Replication:
    allColumns: bool = True
    columns: list[str] = field(default_factory=list)
    useCustomSerializer: bool = False
    useMaterializedView: str | None = None
    pointInTime: PointInTime = field(default_factory=PointInTime)
    filterExpression: str | None = None  # arbitrary Spark-SQL expr (K:1849-1853)
    writetimeColumns: list[str] = field(default_factory=list)  # -> greatest(writetime(..)) K:381-384
    ttlColumn: str | None = None
    transformations: list[Transformation] = field(default_factory=list)


@dataclass
class Compression:
    enabled: bool = False
    compressNonPrimaryColumns: list[str] = field(default_factory=list)
    compressAllNonPrimaryColumns: bool = False
    targetNameColumn: str = "compressedPayload"


@dataclass
class LargeObjects:
    enabled: bool = False
    column: str | None = None
    bucket: str | None = None
    prefix: str = "largeobjects"
    enableRefByTimeUUID: bool = False  # else key=<pk1:pk2..>/payload path (K:682-725)
    compressionEnabled: bool = False


@dataclass
class ReadConfig:
    # Source read tuning defaults (K:76-77)
    splitSizeInMB: int = 64
    concurrentReads: int = 32
    fetchSizeInRows: int = 500
    consistencyLevel: str = "LOCAL_ONE"
    readTimeoutMS: int = 120000
    queryRetryCount: int = 180


@dataclass
class WriteConfig:
    # Batched-write limits (K:74, D:84)
    maxStatementsPerBatch: int = 29
    maxBatchBytes: int = 1024 * 1024
    maxRetries: int = 64
    backoffMS: int = 25
    backoffMultiplier: float = 1.1
    maxBackoffMS: int = 64000


@dataclass
class JsonMapping:
    replication: Replication = field(default_factory=Replication)
    compression: Compression = field(default_factory=Compression)
    largeObjects: LargeObjects = field(default_factory=LargeObjects)
    read: ReadConfig = field(default_factory=ReadConfig)
    write: WriteConfig = field(default_factory=WriteConfig)
    udtConversion: bool = False


class ConfigError(ValueError):
    pass


def resolve(raw: dict) -> JsonMapping:
    """Parse + validate a JSON_MAPPING dict (resolver semantics R:127-279)."""
    rep_raw = dict(raw.get("replication", {}))
    pit = PointInTime(**rep_raw.pop("pointInTime", {}))
    transforms = [Transformation(**t) for t in rep_raw.pop("transformations", [])]

    seen_targets: set[str] = set()
    for t in transforms:
        if t.rule not in TRANSFORM_RULES:
            raise ConfigError(
                f"unknown transformation rule {t.rule!r}; allowed: {TRANSFORM_RULES}"
            )
        if t.keepSource and not t.alias:
            raise ConfigError(
                f"transformation on {t.column!r}: keepSource=true requires an alias"
            )
        target = t.alias or t.column
        if target in seen_targets:
            raise ConfigError(f"duplicate transformation target column {target!r}")
        seen_targets.add(target)

    rep = Replication(**rep_raw, pointInTime=pit, transformations=transforms)
    if not rep.allColumns and not rep.columns:
        raise ConfigError("allColumns=false requires a non-empty columns list")

    return JsonMapping(
        replication=rep,
        compression=Compression(**raw.get("compression", {})),
        largeObjects=LargeObjects(**raw.get("largeObjects", {})),
        read=ReadConfig(**raw.get("read", {})),
        write=WriteConfig(**raw.get("write", {})),
        udtConversion=raw.get("udtConversion", False),
    )


def resolve_b64(encoded: str) -> JsonMapping:
    """The CLI passes JSON_MAPPING base64-encoded (K:561)."""
    return resolve(json.loads(base64.b64decode(encoded)))


def effective_pk(pk_cols: list[str], transforms: list[Transformation]) -> list[str]:
    """Declared PK with transformed columns renamed to their alias (R:265-277)."""
    renames = {t.column: t.alias for t in transforms if t.alias and not t.keepSource}
    return [renames.get(c, c) for c in pk_cols]
