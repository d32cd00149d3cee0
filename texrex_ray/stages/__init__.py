"""Ray Data ``map_batches`` stages.

Every stage is either a pure function ``pyarrow.Table -> pyarrow.Table``
(stateless task) or a callable class (actor pool; state built once in
``__init__``).  Stages never call ``ray.init``.
"""
