"""CLI: the reference's job lifecycle, Spark-side.

Command parity (reference: cli/src/klio_cli/cli.py):
  job run      (cli.py:131-173 → exec run.py:593-645): config → session →
               prologue → user run.py → epilogue write. No Docker layer:
               cluster packaging is spark-submit's job (SURVEY §3.1).
  job test     (cli.py:343-384): pytest in the job dir with
               KLIO_TEST_MODE=1 (disables heavyweight wrapping).
  job profile  (exec/cli.py:160-378): stubbed source from --input-file
               (StubIOMapper parity, profile.py:60-89) + cProfile around
               the user transform.
  job config   (cli.py:440-499): show the parsed config.
  message publish (cli.py:89-92, commands/message/publish.py): drop
               elements into a job's file-stream input dir with force/ping
               and top-down/bottom-up routing.

Usage: python -m klio_spark.cli <job|message> <cmd> [args]
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import time


def _load_user_run(job_dir: str):
    """Import run(df, config) from the job's run.py (exec run.py:262-281;
    run_basic preferred when present)."""
    path = os.path.join(job_dir, "run.py")
    spec = importlib.util.spec_from_file_location("klio_job_run", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)  # type: ignore[union-attr]
    return getattr(mod, "run_basic", None) or mod.run


def _build(config_path: str, templates=None, overrides=None):
    from klio_spark.config import KlioJobConfig
    from klio_spark.session import get_spark

    config = KlioJobConfig.from_yaml(config_path, templates, overrides)
    # relative I/O locations resolve against the job dir (portable examples)
    base = os.path.dirname(os.path.abspath(config_path))
    for io in (
        config.event_inputs + config.event_outputs
        + config.data_inputs + config.data_outputs
    ):
        if io.location and not os.path.isabs(io.location) and "://" not in io.location:
            io.location = os.path.join(base, io.location)
    spark = get_spark(config.job_name, conf=config.spark_confs())
    return spark, config


def cmd_job_run(args) -> int:
    from klio_spark.operators import run_pipeline
    from klio_spark.sinks import write_event_output
    from klio_spark.sources import read_event_input

    spark, config = _build(args.config, args.template, args.override)
    job_dir = args.job_dir or os.path.dirname(os.path.abspath(args.config))
    user_run = _load_user_run(job_dir)

    if not config.event_inputs:
        raise SystemExit("no event inputs configured")
    events = read_event_input(spark, config.event_inputs[0])
    out = run_pipeline(events, config, user_run, spark)
    if out.isStreaming:
        # streaming job: checkpointed text sink next to the output location
        # (pipeline_options.streaming_timeout_s bounds the run; unset → run
        # until stopped, the reference's `streaming: True` default)
        from klio_spark.streaming import write_stream_text

        sink = config.event_outputs[0]
        timeout_s = config.pipeline_options.get("streaming_timeout_s")
        q = write_stream_text(
            out,
            sink.location,
            sink.options.get("checkpoint", sink.location + "_checkpoint"),
            trigger_available_now=bool(timeout_s),
        )
        q.awaitTermination(int(timeout_s) if timeout_s else None)
        return 0
    if config.event_outputs:
        write_event_output(out, config.event_outputs[0])
    else:
        print(f"rows: {out.count()}")
    return 0


def cmd_job_test(args) -> int:
    """KLIO_TEST_MODE parity: _helpers.py:111-122 / job/test.py:27-31."""
    import pytest

    os.environ["KLIO_TEST_MODE"] = "true"
    return pytest.main([args.job_dir or ".", "-v"])


def cmd_job_profile(args) -> int:
    """Profile the user transform over a stubbed source (profile.py:60-89)."""
    import cProfile
    import pstats

    from klio_spark import envelope as env

    spark, config = _build(args.config, args.template, args.override)
    job_dir = args.job_dir or os.path.dirname(os.path.abspath(args.config))
    user_run = _load_user_run(job_dir)

    if args.input_file:
        with open(args.input_file) as f:
            elements = [line.strip() for line in f if line.strip()]
    else:
        elements = args.elements or []
    if not elements:
        raise SystemExit("profile needs --input-file or element ids")

    df = env.from_elements(spark, elements)
    prof = cProfile.Profile()
    t0 = time.perf_counter()
    prof.enable()
    out = user_run(df, config)
    n = out.count()  # force execution
    prof.disable()
    wall = time.perf_counter() - t0
    stats = pstats.Stats(prof)
    stats.sort_stats("cumulative").print_stats(15)
    print(
        json.dumps(
            {
                "elements": len(elements),
                "output_rows": n,
                "wall_sec": round(wall, 3),
                "elements_per_sec": round(len(elements) / wall, 1) if wall else None,
            }
        )
    )
    return 0


def cmd_job_config(args) -> int:
    from klio_spark.config import KlioJobConfig

    config = KlioJobConfig.from_yaml(args.config, args.template, args.override)
    import dataclasses

    print(json.dumps(dataclasses.asdict(config), indent=2, default=str))
    return 0


def cmd_message_publish(args) -> int:
    """Write JSON *wire envelopes* into the job's stream-input dir.

    The flags must ride IN the message (reference publish.py encodes them
    in the KlioMessage) — a bare element line would make readers build
    fresh V2 messages with force=ping=false and recipients=anyone, silently
    dropping what the CLI claims it applied. Lines use the envelope
    to_wire/from_wire JSON schema; the job's stream input reads them with
    ``wire: true``.

    Top-down (default): recipients=anyone. Bottom-up (--bottom-up): only
    this job processes it, and trigger_children_of flips the message back
    to anyone once it passes this job (publish.py:54-72)."""
    from klio_spark.config import KlioJobConfig

    config = KlioJobConfig.from_yaml(args.config, args.template, args.override)
    inp = config.event_inputs[0] if config.event_inputs else None
    if inp is None or not inp.location:
        raise SystemExit("job has no file event input to publish into")
    me = {"job_name": config.job_name, "project": config.project}
    os.makedirs(inp.location, exist_ok=True)
    fname = os.path.join(inp.location, f"publish-{int(time.time()*1000)}.txt")
    with open(fname, "w") as f:
        for el in args.elements:
            msg = {
                "element": el,
                "payload_b64": None,
                "version": 2,
                "force": bool(args.force),
                "ping": bool(args.ping),
                "recipients_mode": "limited" if args.bottom_up else "anyone",
                "recipients": [me] if args.bottom_up else None,
                "trigger_children_of": me if args.bottom_up else None,
                "job_audit_log": [],
            }
            f.write(json.dumps(msg) + "\n")
    mode = "bottom-up" if args.bottom_up else "top-down"
    print(f"published {len(args.elements)} message(s) ({mode}"
          f"{', force' if args.force else ''}{', ping' if args.ping else ''}) "
          f"to {fname}")
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="klio-spark")
    sub = p.add_subparsers(dest="group", required=True)

    job = sub.add_parser("job").add_subparsers(dest="cmd", required=True)
    for name, fn in [
        ("run", cmd_job_run),
        ("test", cmd_job_test),
        ("profile", cmd_job_profile),
        ("config", cmd_job_config),
    ]:
        sp = job.add_parser(name)
        sp.set_defaults(fn=fn)
        sp.add_argument("--config", default="klio-job.yaml")
        sp.add_argument("--job-dir", default=None)
        # klio job run --template KEY=VAL --override path.to.key=VAL
        # (core _preprocessing.py: templates fill $VARs, overrides assign
        # dotted paths; repeatable)
        sp.add_argument("-T", "--template", action="append", default=[])
        sp.add_argument("-O", "--override", action="append", default=[])
        if name == "profile":
            sp.add_argument("--input-file", default=None)
            sp.add_argument("elements", nargs="*")

    msg = sub.add_parser("message").add_subparsers(dest="cmd", required=True)
    pub = msg.add_parser("publish")
    pub.set_defaults(fn=cmd_message_publish)
    pub.add_argument("--config", default="klio-job.yaml")
    pub.add_argument("-T", "--template", action="append", default=[])
    pub.add_argument("-O", "--override", action="append", default=[])
    pub.add_argument("--force", action="store_true")
    pub.add_argument("--ping", action="store_true")
    pub.add_argument("--bottom-up", action="store_true")
    pub.add_argument("elements", nargs="+")

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
