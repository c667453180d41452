"""Frozen BPE merge table (generated file).

Trained by tools/train_bpe.py (24 merges, sf0.001
documents); embedded as literals by BOTH the Spark `doc_bpe_encode`
query and its generated DuckDB oracle so subword splits are
engine-exact. Rank order matters. Do not hand-edit.
"""

MERGES: list[tuple[str, str]] = [
    ('e', 'r'),
    ('o', 'r'),
    ('i', 'n'),
    ('o', 'w'),
    ('s', 't'),
    ('l', 'u'),
    ('a', 'r'),
    ('p', 'ar'),
    ('m', 'er'),
    ('a', 't'),
    ('a', 'n'),
    ('c', 'an'),
    ('s', 'can'),
    ('c', 'o'),
    ('co', 'lu'),
    ('colu', 'm'),
    ('colum', 'n'),
    ('d', 'ow'),
    ('in', 'dow'),
    ('w', 'indow'),
    ('d', 'er'),
    ('or', 'der'),
    ('or', 't'),
    ('s', 'ort'),
]
