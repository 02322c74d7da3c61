"""Config preprocessing: --template / --override parity.

Mirrors the reference's preprocessing tests
(core/tests/config/test_preprocessing.py over
core/src/klio_core/config/_preprocessing.py): $VAR / ${VAR} templating on
the raw YAML text, dotted-path overrides with missing-dict creation, and
the CLI "k=v" list parsing contract.
"""

import pytest

from klio_spark.config import (
    KlioConfigTemplatingError,
    KlioJobConfig,
    apply_overrides,
    parse_key_value_list,
    preprocess,
)

RAW = """
job_name: sigint
project: testproj
job_config:
  allow_non_klio_messages: false
  events:
    inputs:
      - type: file
        location: gs://sigint-output/$YESTERDAY.txt
      - type: file
        location: gs://sigint-output/${GENRE}_$TODAY.txt
  data:
    inputs:
      - type: file
        location: /blobs
        file_suffix: .ogg
"""


def test_templates_lone_and_wrapped():
    cfg = preprocess(RAW, ["YESTERDAY=12-31-2019", "TODAY=01-01-2020", "GENRE=rock"])
    ins = cfg["job_config"]["events"]["inputs"]
    assert ins[0]["location"] == "gs://sigint-output/12-31-2019.txt"
    assert ins[1]["location"] == "gs://sigint-output/rock_01-01-2020.txt"


def test_missing_template_raises():
    with pytest.raises(KlioConfigTemplatingError):
        preprocess(RAW, ["YESTERDAY=x"])  # TODAY/GENRE unresolved


def test_no_templates_passthrough():
    # literal '$' survives when no templates are given
    cfg = preprocess("job_name: a$b", [])
    assert cfg["job_name"] == "a$b"


def test_override_existing_and_created_keys():
    cfg = preprocess(
        RAW,
        ["YESTERDAY=d0", "TODAY=d1", "GENRE=g"],
        [
            "job_config.allow_non_klio_messages=true",
            "job_config.events.inputs.file1.location=gs://x/new.txt",
            "job_config.events.inputs.file2.location=gs://x/extra.txt",
            "job_config.events.inputs.file2.type=file",
            "job_config.brand_new.nested=v",
        ],
    )
    jc = cfg["job_config"]
    assert jc["allow_non_klio_messages"] is True  # coerce_scalar: "true" -> bool
    ins = jc["events"]["inputs"]
    # file1 = second file-typed input (reference's <type><n> naming)
    assert ins[1]["location"] == "gs://x/new.txt"
    # file2 didn't exist -> created (carries its addressing name)
    assert ins[2] == {
        "name": "file2", "location": "gs://x/extra.txt", "type": "file"
    }
    assert jc["brand_new"] == {"nested": "v"}


def test_override_by_index_and_name():
    raw = """
job_config:
  events:
    inputs:
      - type: file
        name: lead
        location: a
      - type: file
        location: b
"""
    cfg = preprocess(raw, [], ["job_config.events.inputs.lead.location=A",
                               "job_config.events.inputs.1.location=B"])
    ins = cfg["job_config"]["events"]["inputs"]
    assert ins[0]["location"] == "A" and ins[1]["location"] == "B"


def test_malformed_override_raises():
    with pytest.raises(ValueError):
        parse_key_value_list(["novalue"])


def test_apply_overrides_plain_dict():
    # override values are YAML-coerced: numeric strings become numbers
    out = apply_overrides({"a": {"b": 1}}, {"a.b": "2", "a.c.d": "3"})
    assert out == {"a": {"b": 2, "c": {"d": 3}}}


def test_override_values_yaml_coerced():
    from klio_spark.config import coerce_scalar

    assert coerce_scalar("false") is False and coerce_scalar("TRUE") is True
    assert coerce_scalar("42") == 42 and coerce_scalar("1.5") == 1.5
    assert coerce_scalar("null") is None
    assert coerce_scalar("hello world") == "hello world"  # interior space kept
    out = apply_overrides({}, {"job_config.flag": "false"})
    assert out["job_config"]["flag"] is False


def test_coerce_scalar_quoting_and_nan_guard():
    from klio_spark.config import coerce_scalar

    # quoting opts out of coercion: a topic named 'off' or a version-like
    # job name stays the literal string
    assert coerce_scalar('"off"') == "off"
    assert coerce_scalar("'1.10'") == "1.10"
    assert coerce_scalar('"42"') == "42"
    # float() accepts nan/inf spellings, but YAML treats them as strings
    # (only .nan/.inf are floats) — they must pass through unchanged
    for s in ("nan", "NaN", "inf", "-inf", "+Infinity"):
        assert coerce_scalar(s) == s
    # plain numerics still coerce
    assert coerce_scalar("1.10") == 1.1 and coerce_scalar("7") == 7


def test_from_yaml_with_templates_and_overrides(tmp_path):
    p = tmp_path / "klio-job.yaml"
    p.write_text(RAW)
    cfg = KlioJobConfig.from_yaml(
        p,
        templates=["YESTERDAY=d0", "TODAY=d1", "GENRE=g"],
        overrides=["job_config.data.inputs.file0.file_suffix=.wav"],
    )
    assert cfg.event_inputs[0].location == "gs://sigint-output/d0.txt"
    assert cfg.data_inputs[0].file_suffix == ".wav"
