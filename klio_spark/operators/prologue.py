"""Canonical pipeline prologue/epilogue assembly.

Reference: exec/src/klio_exec/commands/run.py
  - _generate_pcoll       (:488-508)  read + per-input filter chain
  - _filter_intended_recipients (:411-454)
  - _update_audit_log     (:404-409)
  - _setup_data_io_filters(:320-402)  ping → output-exists → force →
                                      input-exists → drop-not-found,
                                      flattening pass-thru branches
  - _setup_pipeline       (:511-558)  user run(df, config) + epilogue write

Per event input the canonical chain is:
  read → version-tag(+v1 coercion) → recipients filter → audit append →
  ping split → output-exists split → force split → input-exists split →
  drop not_found   ⇒ `process` stream to user code, and the union of
  pass-thru branches (ping + unforced-existing-output) rejoins the user
  output before the event write.

All stages are boolean-predicate filters over envelope columns, so the
whole prologue is one codegen'd scan stage — klio's semantic
short-circuits at zero per-element cost.
"""

from __future__ import annotations

import dataclasses
from functools import reduce

from pyspark.sql import DataFrame, SparkSession

from klio_spark.config import KlioJobConfig
from klio_spark.context import KlioContext
from klio_spark.envelope import coerce_v1
from klio_spark.operators.audit import update_audit_log
from klio_spark.operators.existence import check_input_exists, check_output_exists
from klio_spark.operators.filters import (
    check_recipients,
    filter_force,
    filter_ping,
    tag_message_version,
)


@dataclasses.dataclass
class PrologueResult:
    """`process` goes to user code; `pass_thru` rejoins at the epilogue;
    `not_found` is the dropped branch (input missing) for trigger-upstream."""

    process: DataFrame
    pass_thru: DataFrame | None
    not_found: DataFrame | None


def _union(dfs: list[DataFrame]) -> DataFrame | None:
    dfs = [d for d in dfs if d is not None]
    if not dfs:
        return None
    return reduce(lambda a, b: a.unionByName(b), dfs)


def setup_prologue(
    df: DataFrame,
    config: KlioJobConfig,
    spark: SparkSession | None = None,
    input_listing: DataFrame | None = None,
    output_listing: DataFrame | None = None,
) -> PrologueResult:
    """Apply the canonical per-input prologue to an envelope DataFrame."""
    spark = spark or df.sparkSession
    job, project = config.job_name, config.project

    # version tag + v1 coercion (run.py prologue; serializer compat §1.1)
    tagged = tag_message_version(df)
    df = _union([tagged.process, coerce_v1(tagged.pass_thru)])

    # recipients filter (drops non-addressed messages) + audit append
    df = check_recipients(df, job, project)
    df = update_audit_log(df, job, project)

    pass_thrus: list[DataFrame] = []

    # ping split (run.py:330-346)
    data_in = config.data_inputs[0] if config.data_inputs else None
    data_out = config.data_outputs[0] if config.data_outputs else None

    ping_split = filter_ping(df, data_input_ping=bool(data_in and data_in.ping))
    df = ping_split.process
    pass_thrus.append(ping_split.pass_thru)

    # output-exists → force (run.py:349-378): existing-output rows skip
    # unless forced; the whole chain is gated on the output's
    # skip_klio_existence_check flag (run.py _setup_data_io_filters)
    if data_out is not None and not data_out.skip_klio_existence_check:
        out_split = check_output_exists(df, data_out, spark, listing=output_listing)
        force_split = filter_force(
            out_split.found, data_output_force=bool(data_out.force)
        )
        pass_thrus.append(force_split.pass_thru)
        df = _union([out_split.not_found, force_split.process])

    # input-exists → drop not_found (run.py:380-398)
    not_found: DataFrame | None = None
    if data_in is not None and not data_in.skip_klio_existence_check:
        in_split = check_input_exists(df, data_in, spark, listing=input_listing)
        df = in_split.found
        not_found = in_split.not_found

    return PrologueResult(
        process=df, pass_thru=_union(pass_thrus), not_found=not_found
    )


def setup_prologue_multi(
    inputs: dict[str, DataFrame],
    config: KlioJobConfig,
    spark: SparkSession | None = None,
) -> tuple[dict[str, DataFrame], DataFrame | None, DataFrame | None]:
    """Multi-event-input prologue (run.py:458-486): each input gets the
    canonical chain; user code receives a dict of process streams (the
    namedtuple-of-pcolls contract); pass-thrus and not-founds flatten."""
    processed: dict[str, DataFrame] = {}
    pass_thrus: list[DataFrame] = []
    not_founds: list[DataFrame] = []
    # list each data location ONCE and share across inputs — without
    # this, k event inputs would each trigger their own distributed
    # metadata scan of the identical data input/output dirs
    from klio_spark.operators.existence import list_location

    sp = spark or next(iter(inputs.values())).sparkSession
    data_in = config.data_inputs[0] if config.data_inputs else None
    data_out = config.data_outputs[0] if config.data_outputs else None
    in_listing = (
        list_location(sp, data_in)
        if data_in is not None and not data_in.skip_klio_existence_check
        else None
    )
    out_listing = (
        list_location(sp, data_out)
        if data_out is not None and not data_out.skip_klio_existence_check
        else None
    )
    for name, df in inputs.items():
        res = setup_prologue(
            df,
            config,
            spark,
            input_listing=in_listing,
            output_listing=out_listing,
        )
        processed[name] = res.process
        if res.pass_thru is not None:
            pass_thrus.append(res.pass_thru)
        if res.not_found is not None:
            not_founds.append(res.not_found)
    return processed, _union(pass_thrus), _union(not_founds)


def run_pipeline(
    df: DataFrame,
    config: KlioJobConfig,
    user_run,
    spark: SparkSession | None = None,
    **prologue_kw,
) -> DataFrame:
    """Full job wiring: prologue → user run(df, config) → epilogue union.

    `user_run` keeps the reference's entrypoint contract
    (run(input_pcol, config), run.py:262-281): a callable
    (DataFrame, KlioJobConfig) -> DataFrame over envelope columns.
    Returns the final DataFrame ready for the event writer.
    """
    KlioContext.set_current(KlioContext(config))
    pro = setup_prologue(df, config, spark, **prologue_kw)
    out = user_run(pro.process, config)
    if pro.pass_thru is not None:
        out = out.select(*pro.pass_thru.columns).unionByName(pro.pass_thru)
    return out
