"""Reference-config adapter: run the engine from an APMBackend-style JSONC
config file.

A user of the reference keeps one JSONC file (``config/apm_config.json``)
that fixes window geometry, the z-score settings cascade, and every alert
threshold. This module reads that SAME shape (keys per
``util_methods.js:253-348`` readConfig + the sections consumed by
``stream_calc_stats.js`` / ``stream_calc_z_score.js`` /
``stream_process_alerts.js``) and maps it onto the engine's operator
parameters, so switching engines does not mean rewriting ops config:

    cfg = load_reference_config("apm_config.json")
    st  = st_from_window_stats(window_stats(tx, cfg.window, cfg.slide))
    fs  = zscore_window(st, cfg.lags, cfg.thresholds, overrides=cfg.zscore_overrides)
    al  = alert_pipeline(fs, cfg.alert_config)

Parsing matches the reference reader's contract: ``//`` line comments are
stripped (outside strings), the rest is plain JSON. Hot-reload (md5-diff
watch, ``util_methods.js:253-348``) is a driver-side concern — re-call
``load_reference_config`` per micro-batch and pass fresh params; operator
plans are rebuilt from plain Python values, so a changed config is just a
new query plan.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

from apmbackend_spark.operators.alerts import AlertConfig

# `//` only when preceded by start/whitespace/JSON punctuation — never
# inside a quoted string (covers every line the reference format produces,
# incl. URLs in values, which the reference's own stripper breaks on).
_COMMENT_RE = re.compile(r'^((?:[^"]|"[^"]*")*?)\s*//.*$')


def strip_jsonc_comments(text: str) -> str:
    out = []
    for line in text.splitlines():
        m = _COMMENT_RE.match(line)
        out.append(m.group(1) if m else line)
    return "\n".join(out)


@dataclass(frozen=True)
class EngineConfig:
    """Engine-side rendering of the reference config sections."""

    interval_seconds: int = 10
    window_intervals: int = 30
    buffer_intervals: int = 6
    lags: tuple[int, ...] = (360, 8640)
    thresholds: dict = field(default_factory=dict)     # {lag: threshold}
    influences: dict = field(default_factory=dict)     # {lag: influence}
    zscore_overrides: dict = field(default_factory=dict)  # {svc: {lag: {...}}}
    alert_config: AlertConfig = field(default_factory=AlertConfig)

    @property
    def slide(self) -> str:
        return f"{self.interval_seconds} seconds"

    @property
    def window(self) -> str:
        return f"{self.interval_seconds * self.window_intervals} seconds"

    @property
    def watermark(self) -> str:
        """Late-data bound = the stats stage's excluded-buckets buffer."""
        return f"{self.interval_seconds * self.buffer_intervals} seconds"


def from_reference_dict(cfg: dict) -> EngineConfig:
    stats = cfg.get("streamCalcStats", {})
    zs = cfg.get("streamCalcZScore", {})
    al = cfg.get("streamProcessAlerts", {})

    defaults = zs.get("defaults", [])
    lags = tuple(int(d["LAG"]) for d in defaults)
    thresholds = {int(d["LAG"]): float(d["THRESHOLD"]) for d in defaults}
    influences = {int(d["LAG"]): float(d["INFLUENCE"]) for d in defaults}

    # overrides.services.<svc>.<lag-as-string>.{THRESHOLD, INFLUENCE}
    # -> {svc: {lag: {threshold, influence}}} (engine-side lowercase keys)
    zov = {}
    for svc, per_lag in zs.get("overrides", {}).get("services", {}).items():
        zov[svc] = {
            int(lag): {
                k.lower(): float(v) for k, v in entries.items()
            }
            for lag, entries in per_lag.items()
        }

    alert_overrides = {
        svc: float(entries["hardMaxMsAlertThreshold"])
        for svc, entries in al.get("overrides", {}).get("services", {}).items()
        if "hardMaxMsAlertThreshold" in entries
    }
    alert_config = AlertConfig(
        hard_max_ms=float(al.get("hardMaxMsAlertThreshold", 10000.0)),
        hard_min_ms=float(al.get("hardMinMsAlertThreshold", 200.0)),
        min_tpm=float(al.get("hardMinTpmAlertThreshold", 1.0)),
        alert_on_both_only=bool(al.get("alertOnBothOnly", True)),
        suppressed_lags=tuple(int(x) for x in al.get("suppressedLags", [])),
        suppressed_services=tuple(al.get("suppressedServices", [])),
        hard_max_overrides=alert_overrides,
        window_size=int(al.get("rollingAlertWindowSizeInIntervals", 60)),
        required_bad=int(
            al.get("requiredNumberBadIntervalsInAlertWindowToTrigger", 45)
        ),
        cooldown_minutes=float(al.get("perServiceAlertCooldownInMinutes", 15)),
    )

    return EngineConfig(
        interval_seconds=int(stats.get("intervalLengthInSeconds", 10)),
        window_intervals=int(stats.get("windowSizeInIntervals", 30)),
        buffer_intervals=int(stats.get("bufferSizeInIntervals", 6)),
        lags=lags or (360, 8640),
        thresholds=thresholds,
        influences=influences,
        zscore_overrides=zov,
        alert_config=alert_config,
    )


def load_reference_config(path: str) -> EngineConfig:
    with open(path, encoding="utf-8") as f:
        return from_reference_dict(json.loads(strip_jsonc_comments(f.read())))
