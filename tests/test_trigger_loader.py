"""Trigger/event scheduling semantics + EpochDataLoader epoch bumping."""

import numpy as np

from liteasr_tpu.data.loader import EpochDataLoader
from liteasr_tpu.utils.trigger import EventManager


class FakeTrainer:
    def __init__(self):
        self.epoch = 0
        self.iter = 0


def test_trigger_fires_on_interval():
    trainer = FakeTrainer()
    fired = []
    em = EventManager()
    em.register(lambda: fired.append(trainer.iter), 2, "iteration")

    for i in range(1, 7):
        trainer.iter = i
        em.trigger_iteration_events(trainer)
    assert fired == [2, 4, 6]


def test_epoch_trigger_independent_of_iteration_events():
    trainer = FakeTrainer()
    fired = []
    em = EventManager()
    em.register(lambda: fired.append(trainer.epoch), 1, "epoch")

    em.trigger_iteration_events(trainer)  # wrong unit: no fire
    assert fired == []
    trainer.epoch = 1
    em.trigger_epoch_events(trainer)
    em.trigger_epoch_events(trainer)  # same epoch: fires once
    assert fired == [1]


def test_trigger_survives_resume_past_first_boundary():
    """ADVICE round-1 high: a run resumed at iter=1000 (interval 100) must
    keep firing; exact-equality triggers would stay silent forever."""
    trainer = FakeTrainer()
    fired = []
    em = EventManager()
    em.register(lambda: fired.append(trainer.iter), 100, "iteration")

    trainer.iter = 1000  # restored by resume
    em.align(trainer.iter, trainer.epoch)
    em.trigger_iteration_events(trainer)
    assert fired == []  # boundary 1000 was covered by the pre-restart run

    for i in range(1001, 1201):
        trainer.iter = i
        em.trigger_iteration_events(trainer)
    assert fired == [1100, 1200]


def test_trigger_catches_up_after_counter_jump():
    """Boundary-crossing semantics: a skipped exact boundary still fires
    (once) at the next poll instead of being lost."""
    trainer = FakeTrainer()
    fired = []
    em = EventManager()
    em.register(lambda: fired.append(trainer.iter), 10, "iteration")

    trainer.iter = 25  # jumped over boundaries 10 and 20
    em.trigger_iteration_events(trainer)
    assert fired == [25]  # one catch-up fire, not two
    trainer.iter = 29
    em.trigger_iteration_events(trainer)
    assert fired == [25]  # next boundary is 30
    trainer.iter = 30
    em.trigger_iteration_events(trainer)
    assert fired == [25, 30]


class ListDataset:
    def __init__(self, n):
        self.items = list(range(n))

    def __getitem__(self, i):
        return self.items[i]

    def __len__(self):
        return len(self.items)

    def collator(self, item):
        return item


def test_epoch_loader_bumps_epoch_and_shuffles():
    ds = ListDataset(5)
    loader = EpochDataLoader(ds, shuffle=True, seed=3)
    it = iter(loader)
    first_epoch = [next(it) for _ in range(5)]
    assert sorted(first_epoch) == [0, 1, 2, 3, 4]
    assert loader.epoch == 0
    second_epoch = [next(it) for _ in range(5)]
    assert loader.epoch == 1
    assert sorted(second_epoch) == [0, 1, 2, 3, 4]
    # different order across epochs (w.h.p. for this seed)
    assert first_epoch != second_epoch


def test_epoch_loader_multiworker_preserves_order():
    ds = ListDataset(9)
    loader = EpochDataLoader(ds, shuffle=True, seed=5, num_workers=4,
                             prefetch=2)
    # concurrent collation must not reorder batches: both passes identical
    assert list(loader.epoch_iter(0)) == list(loader.epoch_iter(0))
    assert sorted(loader.epoch_iter(0)) == list(range(9))


def test_producer_exception_propagates():
    class Bad(ListDataset):
        def collator(self, item):
            raise RuntimeError("boom")

    loader = EpochDataLoader(Bad(3), shuffle=False)
    try:
        list(loader.epoch_iter(0))
        raised = False
    except RuntimeError:
        raised = True
    assert raised
