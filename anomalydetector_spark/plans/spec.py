"""Declarative check-suite specs: a JSON document → ``ValidationConfig``.

A validation engine's users are data owners, not Spark programmers; the
standard workflow (Great-Expectations / dbt-test style) is a versioned
spec file per table that CI runs against every snapshot. This module is
that surface: one JSON object, every field optional, unknown fields
REJECTED loudly (a typo like ``"windw"`` silently falling back to the
default is how bad data ships).

Example::

    {
      "window": "1 day",
      "partition_by": "domain",
      "min_points": 12,
      "unique_key": "url",
      "langs": ["en", "de", "fr"],
      "verify_text_extraction": false,
      "shape_drift": true,
      "schema": {"url": "string", "warc_ts": "timestamp",
                 "html": "binary", "text": "string", "lang": "string"},
      "functional_deps": [["url", "lang"], [["domain", "lang"], "text"]],
      "asserts": [
        {"name": "text_nonempty", "expr": "length(text) > 0",
         "max_violation_fraction": 0.001},
        {"name": "url_scheme", "expr": "url like 'http%'"}
      ],
      "agg_asserts": [
        {"name": "avg_len", "metric": "avg(length(text))",
         "expr": "metric between 100 and 100000"}
      ],
      "drift": {"threshold": 0.3, "sensitivity": 99.0,
                "batch_size": 0, "with_margin": false}
    }

The spec maps 1:1 onto :class:`~anomalydetector_spark.engine.
ValidationConfig` (and its nested ``SrParams`` under ``"drift"``), so
anything expressible in code is expressible in the file — there is no
second config system to drift out of sync; this module only translates
and validates.
"""

from __future__ import annotations

import dataclasses
import json

from anomalydetector_spark.engine import ValidationConfig
from anomalydetector_spark.kernel.sr import SrParams
from anomalydetector_spark.operators.asserts import AggAssert, RowAssert

# spec key → ValidationConfig field (identity except the documented ones)
_TOP_ALIASES = {
    "window": "window_duration",
    "drift": "sr",
    "schema": "expected_schema",
}


def config_from_dict(spec: dict) -> ValidationConfig:
    """Validate + translate a spec dict. Raises ``ValueError`` naming
    every unknown key and its valid alternatives."""
    if not isinstance(spec, dict):
        raise ValueError(f"suite spec must be a JSON object, got {type(spec).__name__}")

    cfg_fields = {f.name: f.type for f in dataclasses.fields(ValidationConfig)}
    sr_fields = {f.name for f in dataclasses.fields(SrParams)}

    kwargs = {}
    for key, value in spec.items():
        field = _TOP_ALIASES.get(key, key)
        if field == "sr":
            if not isinstance(value, dict):
                raise ValueError('"drift" must be an object of SrParams fields')
            bad = sorted(set(value) - sr_fields)
            if bad:
                raise ValueError(
                    f"unknown drift field(s) {bad}; valid: {sorted(sr_fields)}"
                )
            kwargs["sr"] = SrParams(**value)
        elif field in ("asserts", "agg_asserts"):
            cls = RowAssert if field == "asserts" else AggAssert
            if not isinstance(value, list):
                raise ValueError(f'"{key}" must be a list of objects')
            items = []
            for j, item in enumerate(value):
                if not isinstance(item, dict):
                    raise ValueError(f'"{key}"[{j}] must be an object')
                allowed = {f.name for f in dataclasses.fields(cls)}
                bad = sorted(set(item) - allowed)
                if bad:
                    raise ValueError(
                        f'unknown "{key}"[{j}] field(s) {bad}; '
                        f"valid: {sorted(allowed)}"
                    )
                items.append(cls(**item))  # __post_init__ validates
            kwargs[field] = tuple(items)
        elif field in cfg_fields:
            if field == "langs":
                value = tuple(value)
            elif field == "freshness" and value is not None:
                if (
                    not isinstance(value, (list, tuple))
                    or len(value) != 2
                    or not isinstance(value[0], int)
                    or not isinstance(value[1], str)
                ):
                    raise ValueError(
                        '"freshness" must be a [max_lag_seconds, '
                        'reference_ts] pair (int, ISO timestamp string)'
                    )
                value = tuple(value)
            elif field in ("cusum", "ewma") and value is not None:
                if (
                    not isinstance(value, (list, tuple))
                    or len(value) != 2
                    or not all(isinstance(x, (int, float)) for x in value)
                ):
                    raise ValueError(
                        f'"{field}" must be a pair of numbers '
                        "(cusum: [k, h] in sigma units; "
                        "ewma: [lambda, L])"
                    )
                value = (float(value[0]), float(value[1]))
            elif field == "attribution_top_n" and value is not None:
                if not isinstance(value, int) or value < 0:
                    raise ValueError(
                        '"attribution_top_n" must be a non-negative int'
                    )
            elif field == "json_schema" and value is not None:
                if (
                    not isinstance(value, dict)
                    or set(value) != {"column", "keys"}
                    or not isinstance(value.get("keys"), dict)
                ):
                    raise ValueError(
                        '"json_schema" must be {"column": <name>, '
                        '"keys": {<json_key>: <spark_type>, ...}}'
                    )
            elif field == "functional_deps":
                if not isinstance(value, list):
                    raise ValueError(
                        '"functional_deps" must be a list of '
                        "[determinant, dependent] pairs"
                    )
                pairs = []
                for j, pair in enumerate(value):
                    if not isinstance(pair, (list, tuple)) or len(pair) != 2:
                        raise ValueError(
                            f'"functional_deps"[{j}] must be a '
                            "[determinant, dependent] pair; each side is "
                            "a column name or a list of column names"
                        )
                    sides = []
                    for side in pair:
                        if isinstance(side, str):
                            sides.append(side)
                        elif (
                            isinstance(side, (list, tuple))
                            and side
                            and all(isinstance(c, str) for c in side)
                        ):
                            sides.append(tuple(side))
                        else:
                            raise ValueError(
                                f'"functional_deps"[{j}] must be a '
                                "[determinant, dependent] pair; each side "
                                "is a column name or a list of column names"
                            )
                    pairs.append(tuple(sides))
                value = tuple(pairs)
            kwargs[field] = value
        else:
            valid = sorted(set(_TOP_ALIASES) | (set(cfg_fields) - {"sr"}))
            raise ValueError(f"unknown suite field {key!r}; valid: {valid}")
    return ValidationConfig(**kwargs)


def load_suite(path: str) -> ValidationConfig:
    """Read a JSON suite file → ``ValidationConfig``."""
    with open(path) as fh:
        return config_from_dict(json.load(fh))


def suite_to_dict(cfg: ValidationConfig) -> dict:
    """Inverse of :func:`config_from_dict` — round-trippable, so a code-
    built config can be frozen to a reviewable file."""
    d = dataclasses.asdict(cfg)
    d["window"] = d.pop("window_duration")
    d["drift"] = d.pop("sr")
    d["schema"] = d.pop("expected_schema")
    d["langs"] = list(d["langs"])
    d["functional_deps"] = [
        [list(side) if isinstance(side, tuple) else side for side in pair]
        for pair in d["functional_deps"]
    ]
    d["asserts"] = [dict(a) for a in d["asserts"]]
    d["agg_asserts"] = [dict(a) for a in d["agg_asserts"]]
    if d["freshness"] is not None:
        d["freshness"] = list(d["freshness"])
    if d["cusum"] is not None:
        d["cusum"] = list(d["cusum"])
    if d["ewma"] is not None:
        d["ewma"] = list(d["ewma"])
    return d
