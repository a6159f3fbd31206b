"""Trigger/event scheduling semantics + EpochDataLoader epoch bumping."""

import numpy as np

from liteasr_tpu.data.loader import EpochDataLoader
from liteasr_tpu.utils.trigger import EventManager, Trigger


class FakeTrainer:
    def __init__(self):
        self.epoch = 0
        self.iter = 0


def test_trigger_fires_on_interval():
    trainer = FakeTrainer()
    fired = []
    trig = Trigger(2, "iteration")
    em = EventManager()
    em.add_event(trig(lambda: fired.append(trainer.iter)))

    for i in range(1, 7):
        trainer.iter = i
        em.trigger_iteration_events(trainer)
    assert fired == [2, 4, 6]


def test_epoch_trigger_independent_of_iteration_events():
    trainer = FakeTrainer()
    fired = []
    trig = Trigger(1, "epoch")
    em = EventManager()
    em.add_event(trig(lambda: fired.append(trainer.epoch)))

    em.trigger_iteration_events(trainer)  # wrong unit: no fire
    assert fired == []
    trainer.epoch = 1
    em.trigger_epoch_events(trainer)
    em.trigger_epoch_events(trainer)  # same epoch: fires once
    assert fired == [1]


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


def test_epoch_loader_sharding_covers_dataset():
    ds = ListDataset(7)
    got = []
    for shard in range(2):
        loader = EpochDataLoader(ds, shuffle=True, seed=5,
                                 num_shards=2, shard_index=shard)
        got.extend(loader.epoch_iter(0))
    assert sorted(got) == list(range(7))


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
