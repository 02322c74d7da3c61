"""Simplest possible job: elements in, elements out (golden-output
identity). Mirrors the reference's integration/read-file-write-file job
(its integration_test.py asserts input file == output file)."""


def run(df, config):
    return df
