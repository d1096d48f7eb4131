"""Earth-relative -> grid-relative wind rotation for Lambert grids.

Replaces ``rotate_winds_cgrid`` (interp.F90:689-749), applied when both wind
components were interpolated and proj is Lambert (interp.F90:138-140,
291-293).

Quirk Q4 is preserved exactly: the reference rotates u IN PLACE first and
then computes v from the ALREADY-ROTATED u (interp.F90:741-745):

    tana = sina/cosa
    u' = (u + v*tana) / (cosa + sina*tana)
    v' = (v - u'*sina) / cosa          # <- u', not u

(The matching-matrix inverse would use the original u; bit-parity with the
reference requires the sequential form.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def rotate_winds(u, v, cosa, sina):
    """u, v: (ny, nx) or (ny, nx, nz); cosa/sina: (ny, nx).

    Returns (u_rot, v_rot) with the reference's sequential update order."""
    if u.ndim == 3:
        cosa = cosa[:, :, None]
        sina = sina[:, :, None]
    tana = sina / cosa
    u_new = (u + v * tana) / (cosa + sina * tana)
    v_new = (v - u_new * sina) / cosa
    return u_new, v_new
