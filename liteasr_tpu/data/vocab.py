"""Vocabulary (reference: liteasr/dataclass/vocab.py:4-85).

File format: ``<token> <tokenid>`` per line, ids starting at 1 (0 is the
implicit ``<blank>``); ``<sos/eos>`` is appended as the last id. Unknown
tokens map to ``<unk>``; ``convert`` strips specials and maps ``<space>`` to
a literal space.
"""

from typing import Any, Iterable


class Vocab:
    def __init__(self, vocab_path: str) -> None:
        self.token2id = {"<blank>": 0}
        self.id2token = ["<blank>"]
        with open(vocab_path, "r") as vocab:
            for line in vocab:
                entry = line.strip().split()
                if len(entry) != 2:
                    raise ValueError(f"Invalid line is found:\n>    {line}")
                token, tokenid = entry
                if int(tokenid) != len(self.id2token):
                    raise ValueError(f"Missing token id: {len(self.id2token)}")
                self.token2id[token] = int(tokenid)
                self.id2token.append(token)
        self.token2id["<sos/eos>"] = len(self.id2token)
        self.id2token.append("<sos/eos>")

    @property
    def valid(self) -> bool:
        return all(self.id2token[self.token2id[t]] == t for t in self.token2id)

    def __getitem__(self, index):
        if isinstance(index, str):
            if index in self.token2id:
                return self.token2id[index]
            return self.token2id["<unk>"]
        if isinstance(index, int):
            if index < len(self.id2token):
                return self.id2token[index]
            raise IndexError("Index out of range of vocabulary")
        raise KeyError(f"Key {index} is not valid")

    def convert(self, index: int) -> str:
        assert isinstance(index, int)
        token = self.id2token[index]
        if token in ("<blank>", "<sos/eos>"):
            return ""
        if token == "<space>":
            return " "
        return token

    def __len__(self) -> int:
        return len(self.id2token)

    def lookupi(self, seq: Iterable[Any], convert: bool = False):
        if not convert:
            return map(lambda t: self[t], seq)
        return map(lambda t: self.convert(int(t)), seq)

    def lookup(self, seq: Iterable[Any], convert: bool = False):
        return tuple(self.lookupi(seq, convert=convert))
