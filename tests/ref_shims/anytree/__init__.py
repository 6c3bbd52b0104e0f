"""Minimal stand-in for the ``anytree`` package (not installed in this
environment), covering exactly the surface the reference implementation
uses (``/root/reference/oinkoink/tree.py:4``, ``mcts.py:7``): ``Node``
with ``name``, arbitrary data kwargs, ``parent`` re-parenting, ordered
``children`` and ``is_root``.

Used only by ``tests/test_reference_crossval.py`` to execute the
reference's own MCTS as a cross-validation oracle; never imported by
the framework itself.
"""


class Node:
    def __init__(self, name, parent=None, **kwargs):
        self.name = name
        self._parent = None
        self._children = []
        for key, value in kwargs.items():
            setattr(self, key, value)
        if parent is not None:
            self.parent = parent

    @property
    def parent(self):
        return self._parent

    @parent.setter
    def parent(self, new_parent):
        if self._parent is not None:
            self._parent._children.remove(self)
        self._parent = new_parent
        if new_parent is not None:
            new_parent._children.append(self)

    @property
    def children(self):
        return tuple(self._children)

    @property
    def is_root(self):
        return self._parent is None

    def __repr__(self):
        return f"Node({self.name!r})"
