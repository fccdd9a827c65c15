"""The optional W&B mirror of the experiment tracker, exercised against a
stubbed `wandb` module (reference behavior: nn/experiment.py:47-66, 337-360 —
runs init with project/name/id + resume='allow', metrics mirror via log()).

The real package is absent from the deployment image, so these tests inject a
recording stub into sys.modules and assert the tracker drives the init/log
call sequence correctly — and degrades to local-only when wandb breaks."""
import json
import sys
import types

import pytest

from garment_pattern_estimation_tpu.experiment import ExperimentWrappper


class _StubRun:
    def __init__(self, **kwargs):
        self.kwargs = kwargs


class _StubWandb(types.ModuleType):
    def __init__(self, fail_init=False):
        super().__init__('wandb')
        self.calls = []
        self.fail_init = fail_init

    def init(self, **kwargs):
        self.calls.append(('init', kwargs))
        if self.fail_init:
            raise RuntimeError('no network')
        return _StubRun(**kwargs)

    def log(self, record, step=None):
        self.calls.append(('log', dict(record), step))


@pytest.fixture()
def stub_wandb(monkeypatch):
    stub = _StubWandb()
    monkeypatch.setitem(sys.modules, 'wandb', stub)
    return stub


def _make_tracker(tmp_path, **kwargs):
    config = {'experiment': {'project_name': 'proj', 'run_name': 'run'},
              'trainer': {'batch_size': 4}}
    return ExperimentWrappper(config, output_root=str(tmp_path), **kwargs)


def test_wandb_mirror_init_and_log_sequence(tmp_path, stub_wandb):
    tracker = _make_tracker(tmp_path)
    run_id = tracker.init_run()

    init_calls = [c for c in stub_wandb.calls if c[0] == 'init']
    assert len(init_calls) == 1
    kwargs = init_calls[0][1]
    assert kwargs['project'] == 'proj'
    assert kwargs['name'] == 'run'
    assert kwargs['id'] == run_id
    assert kwargs['resume'] == 'allow'
    assert kwargs['config'] == tracker.config

    tracker.log({'loss': 1.5}, step=0)
    tracker.log({'loss': 1.25})  # auto-increment step
    log_calls = [c for c in stub_wandb.calls if c[0] == 'log']
    assert [(c[1]['loss'], c[2]) for c in log_calls] == [(1.5, 0), (1.25, 1)]
    # the local metrics file stays the source of truth alongside the mirror
    lines = (tracker.run_dir() / 'metrics.jsonl').read_text().splitlines()
    assert [json.loads(line)['loss'] for line in lines] == [1.5, 1.25]


def test_wandb_init_failure_degrades_to_local_only(tmp_path, monkeypatch, capsys):
    stub = _StubWandb(fail_init=True)
    monkeypatch.setitem(sys.modules, 'wandb', stub)
    tracker = _make_tracker(tmp_path)
    tracker.init_run()
    assert 'wandb sync disabled' in capsys.readouterr().out

    tracker.log({'loss': 2.0}, step=0)  # must not touch the broken mirror
    assert [c[0] for c in stub.calls] == ['init']
    lines = (tracker.run_dir() / 'metrics.jsonl').read_text().splitlines()
    assert json.loads(lines[0])['loss'] == 2.0


def test_no_sync_skips_wandb_entirely(tmp_path, stub_wandb):
    tracker = _make_tracker(tmp_path, no_sync=True)
    tracker.init_run()
    tracker.log({'loss': 1.0}, step=0)
    assert stub_wandb.calls == []
