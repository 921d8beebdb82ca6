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
        extra_spark_conf={"spark.stage.maxConsecutiveAttempts": "8"},
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
