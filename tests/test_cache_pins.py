"""Unit tests for the pinned-intermediate cache ledger (cache.py).

The ledger is thread-local (ADVICE r13): the @query decorator releases
pins at the top of every registered build, so concurrent builds in one
process must not unpersist each other's pins mid-build.
"""

from __future__ import annotations

import threading

from pg_telemetry_spark.cache import pin, release_pinned


def _storage_level_used(df) -> bool:
    return df._jdf.storageLevel().useMemory() or df._jdf.storageLevel().useDisk()


def test_release_is_idempotent_and_empties_ledger(spark):
    df = pin(spark.range(10))
    assert _storage_level_used(df)
    release_pinned()
    assert not _storage_level_used(df)
    release_pinned()  # second release: no-op, no raise


def test_pins_are_thread_local(spark):
    """A release on one thread must not unpersist another thread's
    live pin."""
    main_pin = pin(spark.range(20))
    assert _storage_level_used(main_pin)

    errs: list = []

    def other_build():
        try:
            other = pin(spark.range(30))
            assert _storage_level_used(other)
            release_pinned()  # releases ONLY this thread's ledger
            assert not _storage_level_used(other)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    t = threading.Thread(target=other_build)
    t.start()
    t.join()
    assert not errs
    # the other thread's release did not touch this thread's pin
    assert _storage_level_used(main_pin), (
        "another thread's release_pinned unpersisted this thread's pin"
    )
    release_pinned()
    assert not _storage_level_used(main_pin)
