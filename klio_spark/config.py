"""klio-job.yaml-shaped job configuration.

Mirrors the reference's config system (core/src/klio_core/config/core.py:
36-319 BaseKlioConfig/KlioConfig/KlioJobConfig, config/_io.py:42-69
@supports registry keyed on (type, direction)) with plain dataclasses:

    job_name: my-job
    pipeline_options: {...}            # -> SparkSession confs
    job_config:
      allow_non_klio_messages: false
      events:
        inputs:  [{type: file, location: ..., format: text}]
        outputs: [{type: file, location: ..., format: parquet}]
      data:
        inputs:  [{type: file, location: ..., file_suffix: .ogg, ping: false,
                   skip_klio_existence_check: false}]
        outputs: [{type: file, location: ..., file_suffix: .png, force: false}]
      <arbitrary user keys>            # dynamic attributes (core.py:186-209)

The dual-channel split — *event* I/O (what to work on) vs *data* I/O
(where the heavy bytes live) — is the user-facing contract (SURVEY §1.3).
"""

from __future__ import annotations

import dataclasses
from typing import Any

try:
    import yaml
    _HAS_YAML = True
except ImportError:  # pragma: no cover - pyyaml is in the base image
    _HAS_YAML = False


@dataclasses.dataclass
class EventIOConfig:
    """One event input/output. type selects the reader/writer from the
    sources/sinks registry (mirrors config/_io.py:200-492)."""

    type: str = "file"
    location: str | None = None
    format: str = "text"  # text | parquet | avro | json | csv
    skip_klio_read: bool = False   # config/_io.py:135-153
    skip_klio_write: bool = False  # config/_io.py:157-175
    options: dict[str, Any] = dataclasses.field(default_factory=dict)
    # streaming (pub/sub stand-in) knobs
    topic: str | None = None
    subscription: str | None = None

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "EventIOConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in d.items() if k in known}
        kw.setdefault("options", {})
        kw["options"].update({k: v for k, v in d.items() if k not in known})
        return cls(**kw)


@dataclasses.dataclass
class DataIOConfig:
    """One data input/output: a blob location + suffix and the existence /
    ping / force short-circuit flags (config/_io.py:317-331, 494-531)."""

    type: str = "file"
    location: str | None = None
    file_suffix: str = ""
    ping: bool = False
    force: bool = False
    skip_klio_existence_check: bool = False

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "DataIOConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


@dataclasses.dataclass
class KlioJobConfig:
    job_name: str = "klio-spark-job"
    project: str = "local"
    allow_non_klio_messages: bool = False
    event_inputs: list[EventIOConfig] = dataclasses.field(default_factory=list)
    event_outputs: list[EventIOConfig] = dataclasses.field(default_factory=list)
    data_inputs: list[DataIOConfig] = dataclasses.field(default_factory=list)
    data_outputs: list[DataIOConfig] = dataclasses.field(default_factory=list)
    pipeline_options: dict[str, Any] = dataclasses.field(default_factory=dict)
    user: dict[str, Any] = dataclasses.field(default_factory=dict)  # core.py:186-209

    @classmethod
    def from_dict(cls, raw: dict[str, Any]) -> "KlioJobConfig":
        jc = dict(raw.get("job_config", {}))
        events = jc.pop("events", {}) or {}
        data = jc.pop("data", {}) or {}
        allow = jc.pop("allow_non_klio_messages", False)
        return cls(
            job_name=raw.get("job_name", "klio-spark-job"),
            project=raw.get("project", raw.get("gcp_project", "local")),
            allow_non_klio_messages=allow,
            event_inputs=[EventIOConfig.from_dict(d) for d in events.get("inputs", [])],
            event_outputs=[EventIOConfig.from_dict(d) for d in events.get("outputs", [])],
            data_inputs=[DataIOConfig.from_dict(d) for d in data.get("inputs", [])],
            data_outputs=[DataIOConfig.from_dict(d) for d in data.get("outputs", [])],
            pipeline_options=dict(raw.get("pipeline_options", {})),
            user=jc,  # leftover keys are dynamic user attributes
        )

    @classmethod
    def from_yaml(cls, path: str) -> "KlioJobConfig":
        if not _HAS_YAML:
            raise RuntimeError("pyyaml not available; use from_dict")
        with open(path) as f:
            return cls.from_dict(yaml.safe_load(f) or {})

    def spark_confs(self) -> dict[str, str]:
        """pipeline_options that look like spark confs pass through."""
        return {
            k: str(v)
            for k, v in self.pipeline_options.items()
            if k.startswith("spark.")
        }
