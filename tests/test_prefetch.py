"""Prefetch thread semantics: order, exhaustion, exception propagation."""

import time

import pytest

from kat_tpu.io.prefetch import prefetch


def test_order_preserved():
    assert list(prefetch(range(100), depth=3)) == list(range(100))


def test_empty():
    assert list(prefetch([], depth=2)) == []


def test_exception_propagates():
    def gen():
        yield 1
        yield 2
        raise ValueError("boom")

    it = prefetch(gen(), depth=2)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(ValueError, match="boom"):
        next(it)


def test_producer_runs_ahead():
    produced = []

    def gen():
        for i in range(5):
            produced.append(i)
            yield i

    it = prefetch(gen(), depth=4)
    first = next(it)
    time.sleep(0.1)
    # producer should have buffered ahead without being pulled
    assert first == 0
    assert len(produced) >= 4
    assert list(it) == [1, 2, 3, 4]
