"""End-to-end golden fixtures: run the kernel pipeline over every reference
WARC/ARC fixture and assert the output matches the reference's golden CDX
lines byte-for-byte (reference tests/test_small_warcs.py semantics: output
of ``--all-records`` must end with the golden line(s); test_excludes.py:
full-output equality + filtered counts)."""

import os

import pytest

from cdx_writer_spark.kernels.pipeline import (load_excludes,
                                               make_cdx_for_file)
from tests.goldens import EXCLUDE_GOLDENS, SMALL_WARC_GOLDENS

FIXTURE_DIR = "/root/reference/tests"


@pytest.mark.parametrize("fname", sorted(SMALL_WARC_GOLDENS), ids=str)
def test_small_warc_golden(fname):
    path = os.path.join(FIXTURE_DIR, fname)
    assert os.path.exists(path)
    header, lines, _stats = make_cdx_for_file(path, warc_path=fname,
                                              all_records=True)
    output = "\n".join([header] + lines)
    expected = SMALL_WARC_GOLDENS[fname]
    assert output.encode("utf-8").endswith(expected.encode("utf-8")), (
        "\n  expected: %r\n       got: %r" % (expected, "\n".join(lines)))


@pytest.mark.parametrize("case", range(len(EXCLUDE_GOLDENS)), ids=str)
def test_exclude_golden(case):
    t = EXCLUDE_GOLDENS[case]
    path = os.path.join(FIXTURE_DIR, t["file"])
    excludes = load_excludes(t["exclude"] + "\n")
    header, lines, stats = make_cdx_for_file(path, warc_path=t["file"],
                                             all_records=True,
                                             excludes=excludes)
    output = header + "\n" + "".join(line + "\n" for line in lines)
    assert output == t["result"], (
        "\n  expected: %r\n       got: %r" % (t["result"], output))
    assert stats["num_records_filtered"] == t["num_filtered"]
