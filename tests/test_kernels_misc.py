"""Doctests + unit checks for the remaining kernel functions (P13 charset,
P16 to_unicode, P17 urljoin_and_normalize — reference doctests at
cdx_writer.py:487-508)."""

import doctest

from cdx_writer_spark.kernels import fields as K


def test_urljoin_doctests():
    results = doctest.run_docstring_examples(
        K.urljoin_and_normalize, {"urljoin_and_normalize":
                                  K.urljoin_and_normalize},
        verbose=False)
    # run_docstring_examples returns None; use testmod on the module instead
    fails, ran = doctest.testmod(K, verbose=False).failed, \
        doctest.testmod(K, verbose=False).attempted
    assert ran >= 4
    assert fails == 0


def test_parse_charset():
    headers = [b"Content-Type: text/html; charset=ISO-8859-1"]
    assert K.parse_charset(headers, None) == "ISO-8859-1"
    assert K.parse_charset([b"Content-Type: text/html"],
                           {"content-type": "text/html; charset=win-1251"}) \
        == "windows-1251"
    assert K.parse_charset(None, None) is None


def test_to_unicode():
    assert K.to_unicode(b"caf\xe9", "latin-1") == "café"
    assert K.to_unicode(b"caf\xe9", "not-a-charset") == "caf�"
    assert K.to_unicode("already-str", "utf-8") == "already-str"


def test_unknown_format_field_raises():
    from cdx_writer_spark.kernels.fields import cdx_line
    import pytest
    with pytest.raises(KeyError):
        cdx_line({"N": "x"}, fmt="N Z")
