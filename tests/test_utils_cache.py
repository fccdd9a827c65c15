"""Compilation-cache fingerprinting + poisoned-cache containment
(round-1 driver failure: a cached AOT executable built against a different
libtpu crashed the multichip dryrun; a stale cache must degrade to a slow
start, never to a crash)."""
import pytest

from garment_pattern_estimation_tpu import utils


def test_is_cache_poisoning_specific_markers():
    assert utils.is_cache_poisoning(RuntimeError(
        'FAILED_PRECONDITION: libtpu version mismatch: terminal has "..."'))
    assert utils.is_cache_poisoning(RuntimeError(
        'cpu_aot_loader.cc:210 Loading XLA:CPU AOT result ...'))
    assert utils.is_cache_poisoning(RuntimeError(
        'Machine type used for XLA:CPU compilation does not match'))
    # generic runtime errors must NOT wipe the cache
    assert not utils.is_cache_poisoning(RuntimeError(
        'FAILED_PRECONDITION: donated buffer was already consumed'))
    assert not utils.is_cache_poisoning(ValueError('shape mismatch'))


def test_containment_retries_once_after_poisoning(tmp_path, capsys):
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) == 1:
            raise RuntimeError('libtpu version mismatch: stale AOT blob')
        return 'recovered'

    # point the module at a throwaway cache dir so the clear is observable
    cache_dir = tmp_path / 'cache'
    cache_dir.mkdir()
    (cache_dir / 'entry.blob').write_bytes(b'stale')
    utils._CACHE_DIR = str(cache_dir)
    try:
        assert utils.run_with_cache_containment(flaky) == 'recovered'
    finally:
        utils._CACHE_DIR = None
    assert len(calls) == 2
    assert not cache_dir.exists(), 'poisoned cache dir should be deleted'
    assert 'recompiling fresh' in capsys.readouterr().out


def test_containment_reraises_unrelated_errors():
    def broken():
        raise ValueError('a real bug, not a cache problem')

    with pytest.raises(ValueError):
        utils.run_with_cache_containment(broken)
