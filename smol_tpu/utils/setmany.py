"""SetMany descriptor: broadcast attribute sets over a container.

Mirrors smol/utils/setmany.py.
"""

from __future__ import annotations

__all__ = ["SetMany"]


class SetMany:
    """Descriptor that forwards attribute assignment to container values."""

    def __init__(self, attr_name: str, container_name: str):
        """Initialize SetMany.

        Args:
            attr_name: attribute to set on each contained object.
            container_name: name of the (dict or sequence) attribute holding
                the objects.
        """
        self.attr_name = attr_name
        self.container_name = container_name

    def __set_name__(self, owner, name):
        self.public_name = name
        self.private_name = "_" + name

    def __get__(self, obj, objtype=None):
        return getattr(obj, self.private_name, None)

    def __set__(self, obj, value):
        setattr(obj, self.private_name, value)
        container = getattr(obj, self.container_name)
        values = container.values() if hasattr(container, "values") else container
        for item in values:
            setattr(item, self.attr_name, value)
