"""Background batch prefetch (data/prefetch.py)."""

import time

import pytest

from zs_aac_tpu.data.prefetch import prefetch


def test_prefetch_order_and_completeness():
    assert list(prefetch(iter(range(100)), depth=3)) == list(range(100))


def test_prefetch_propagates_exceptions_in_order():
    def gen():
        yield 1
        yield 2
        raise ValueError("boom")

    it = prefetch(gen(), depth=2)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(ValueError, match="boom"):
        next(it)


def test_prefetch_early_break_terminates_worker():
    produced = []

    def gen():
        for i in range(10_000):
            produced.append(i)
            yield i

    it = prefetch(gen(), depth=2)
    for x in it:
        if x == 5:
            break
    it.close()           # generator finally -> stop event
    time.sleep(0.5)      # give the worker a timeout cycle to exit
    n = len(produced)
    time.sleep(0.3)
    assert len(produced) == n  # worker stopped producing
    assert n < 100
