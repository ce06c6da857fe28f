"""Node taxonomy for mesh-physics graphs.

Mirrors the semantics of the reference ``graphphysics/utils/nodetype.py:4-15``:
an integer enum with ``SIZE = 9`` one-hot classes. Values 7/8 are unused by the
reference; we reserve 8 for padding nodes introduced by static-shape bucketing
(padded nodes one-hot cleanly and are excluded from every loss / statistic via
masks).
"""

import enum


class NodeType(enum.IntEnum):
    NORMAL = 0
    OBSTACLE = 1
    AIRFOIL = 2
    HANDLE = 3
    INFLOW = 4
    OUTFLOW = 5
    WALL_BOUNDARY = 6
    PADDING = 8  # graphphysics_tpu extension: static-shape padding nodes
    SIZE = 9


GLOBAL_ATTENTION_NODE = NodeType.WALL_BOUNDARY
