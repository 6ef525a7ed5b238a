"""Driver-window ordering contract (VERDICT r2 item 1).

The correctness driver hash-checks only the first 50 ``all_queries()``
entries. These tests pin that every query named in ``DRIVER_PRIORITY``
(never driver-verified before this round, or new this round) occupies
the checked window, so a registration-order regression can't silently
un-verify new work again.
"""

from cdc_example_spark import queries as qpkg
from cdc_example_spark.queries import all_queries
from cdc_example_spark.queries.registry import set_driver_order

import pytest

DRIVER_WINDOW = 50


def test_priority_queries_inside_driver_window():
    names = list(all_queries())
    window = set(names[:DRIVER_WINDOW])
    missing = [n for n in qpkg.DRIVER_PRIORITY if n not in window]
    assert not missing, f"priority queries outside the driver's 50-entry window: {missing}"


def test_priority_preserves_full_registry():
    names = list(all_queries())
    assert len(names) == len(set(names))
    # Reordering must not drop or duplicate entries.
    assert sorted(names) == sorted(set(names))
    assert names[: len(qpkg.DRIVER_PRIORITY)] == qpkg.DRIVER_PRIORITY


def test_set_driver_order_rejects_unknown_names():
    with pytest.raises(ValueError, match="unknown query names"):
        set_driver_order(["q999_not_a_query"])
    # Failed call must not clobber the active ordering.
    assert list(all_queries())[: len(qpkg.DRIVER_PRIORITY)] == qpkg.DRIVER_PRIORITY
