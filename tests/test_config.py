"""Reference-config adapter: JSONC parsing + key mapping + end-to-end use
of the mapped parameters in the operator chain."""

from __future__ import annotations

import textwrap

from apmbackend_spark import config as cf

# Same SHAPE as the reference config/apm_config.json (the public key
# surface the adapter must accept); values are this test's own.
SAMPLE = textwrap.dedent(
    """
    {
        // comment line
        "streamCalcStats": {
            "intervalLengthInSeconds": 10, // trailing comment
            "windowSizeInIntervals": 30,
            "bufferSizeInIntervals": 6
        },
        "streamCalcZScore": {
            "defaults": [
                { "LAG": 60, "THRESHOLD": 4.0, "INFLUENCE": 0.5 },
                { "LAG": 360, "THRESHOLD": 2.5, "INFLUENCE": 0.0 }
            ],
            "overrides": {
                "services": {
                    "S:checkout": { "60": { "THRESHOLD": 6.0, "INFLUENCE": 0.9 } },
                    "error": { "360": { "THRESHOLD": 1.5 } }
                }
            }
        },
        "streamProcessAlerts": {
            "hardMinMsAlertThreshold": 150,
            "hardMaxMsAlertThreshold": 9000, // a "url" http://x//y in a comment
            "hardMinTpmAlertThreshold": 0.5,
            "alertOnBothOnly": false,
            "overrides": {
                "services": { "S:slow": { "hardMaxMsAlertThreshold": 20000 } }
            },
            "suppressedLags": [360],
            "rollingAlertWindowSizeInIntervals": 12,
            "requiredNumberBadIntervalsInAlertWindowToTrigger": 9,
            "suppressedServices": ["S:noisy"],
            "perServiceAlertCooldownInMinutes": 30
        }
    }
    """
)


def _cfg() -> cf.EngineConfig:
    import json

    return cf.from_reference_dict(json.loads(cf.strip_jsonc_comments(SAMPLE)))


def test_jsonc_stripper_preserves_strings():
    s = '{"a": "keep//this", "b": 1} // drop'
    stripped = cf.strip_jsonc_comments(s)
    import json

    assert json.loads(stripped) == {"a": "keep//this", "b": 1}


def test_window_geometry_mapping():
    cfg = _cfg()
    assert cfg.window == "300 seconds"
    assert cfg.slide == "10 seconds"
    assert cfg.watermark == "60 seconds"


def test_zscore_cascade_mapping():
    cfg = _cfg()
    assert cfg.lags == (60, 360)
    assert cfg.thresholds == {60: 4.0, 360: 2.5}
    assert cfg.influences == {60: 0.5, 360: 0.0}
    assert cfg.zscore_overrides == {
        "S:checkout": {60: {"threshold": 6.0, "influence": 0.9}},
        "error": {360: {"threshold": 1.5}},
    }


def test_alert_config_mapping():
    a = _cfg().alert_config
    assert a.hard_max_ms == 9000.0 and a.hard_min_ms == 150.0
    assert a.min_tpm == 0.5 and a.alert_on_both_only is False
    assert a.suppressed_lags == (360,) and a.suppressed_services == ("S:noisy",)
    assert a.hard_max_overrides == {"S:slow": 20000.0}
    assert a.window_size == 12 and a.required_bad == 9
    assert a.cooldown_minutes == 30.0


def test_config_drives_operator_chain(spark):
    # the mapped values plug straight into the batch chain and resolve the
    # same cascade the dict-literal path uses
    from apmbackend_spark.operators import zscore as zs
    from apmbackend_spark.operators.window_stats import window_stats
    from apmbackend_spark.sources.tx import load_tx
    from tests.conftest import SF_SMOKE

    cfg = _cfg()
    tx = load_tx(spark, SF_SMOKE)
    st = zs.st_from_window_stats(window_stats(tx, cfg.window, cfg.slide))
    fs = zs.zscore_window(
        st,
        lags=cfg.lags,
        threshold=cfg.thresholds,
        overrides=cfg.zscore_overrides,
    )
    assert fs.columns[:4] == ["timestamp", "server", "service", "tpm"]
    assert {r["lag"] for r in fs.select("lag").distinct().collect()} == {60, 360}


def test_defaults_on_empty_config():
    cfg = cf.from_reference_dict({})
    assert cfg.lags == (360, 8640)
    assert cfg.window == "300 seconds"
    assert cfg.alert_config.hard_max_ms == 10000.0
