"""bench.py transient-backend retry (VERDICT r3 item 1).

Round 3's driver bench capture was lost to a single transient axon-tunnel
init failure. These tests force every branch of the retry harness with
injected sleep/execv hooks — no backend is touched.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402

ENV = "DGP_BENCH_TEST_ATTEMPT"
AXON_MSG = ("Unable to initialize backend 'axon': UNAVAILABLE: TPU backend "
            "setup/compile error (Unavailable).")


@pytest.fixture(autouse=True)
def _clean_attempt_env():
    os.environ.pop(ENV, None)
    yield
    os.environ.pop(ENV, None)


def _harness():
    calls = {"sleep": [], "execv": []}
    hooks = dict(sleep=lambda s: calls["sleep"].append(s),
                 execv=lambda p, a: calls["execv"].append((p, a)),
                 argv=["py", "bench.py"], attempt_env=ENV)
    return calls, hooks


def test_transient_error_classification():
    assert bench._is_transient_backend_error(RuntimeError(AXON_MSG))
    assert bench._is_transient_backend_error(
        RuntimeError("DEADLINE_EXCEEDED: tunnel timed out"))
    # numerics / programming failures must never be retried
    assert not bench._is_transient_backend_error(
        AssertionError("benchmark loss went non-finite"))
    assert not bench._is_transient_backend_error(ValueError("bad shape"))
    assert not bench._is_transient_backend_error(
        RuntimeError("some unrelated runtime problem"))


def test_retry_sleeps_and_reexecs_on_transient_failure():
    calls, hooks = _harness()

    def boom():
        raise RuntimeError(AXON_MSG)

    res = bench._run_with_retry(boom, max_attempts=3, backoff_s=0.25, **hooks)
    assert res is None  # injected execv is a no-op; real execv never returns
    assert calls["sleep"] == [0.25]
    assert calls["execv"] == [("py", ["py", "bench.py"])]
    # the fresh process sees the incremented attempt counter
    assert os.environ[ENV] == "1"


def test_retry_exhausts_attempt_budget():
    calls, hooks = _harness()
    os.environ[ENV] = "2"  # third (= final) attempt

    def boom():
        raise RuntimeError(AXON_MSG)

    with pytest.raises(RuntimeError, match="UNAVAILABLE"):
        bench._run_with_retry(boom, max_attempts=3, backoff_s=0.25, **hooks)
    assert calls["sleep"] == [] and calls["execv"] == []


def test_numerics_failure_is_never_retried():
    calls, hooks = _harness()

    def bad_loss():
        raise AssertionError("benchmark loss went non-finite")

    with pytest.raises(AssertionError):
        bench._run_with_retry(bad_loss, max_attempts=3, backoff_s=0.25,
                              **hooks)
    assert calls["sleep"] == [] and calls["execv"] == []


def test_success_passes_value_through():
    calls, hooks = _harness()
    assert bench._run_with_retry(lambda: 42.0, max_attempts=3,
                                 backoff_s=0.25, **hooks) == 42.0
    assert calls["sleep"] == [] and calls["execv"] == []
