"""Multi-device / multi-host scale-out (mesh, shardings, distributed init)."""
from .mesh import (  # noqa: F401
    make_mesh,
    place,
    state_shardings,
    trainer_state_shardings,
)
