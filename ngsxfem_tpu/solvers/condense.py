"""Static condensation (Schur-complement elimination of LOCAL dofs).

The reference gets this from NGSolve's generic condensation machinery; the
trace flag of XFESpace (``xfem/xFESpace.cpp:72-97``) exists purely to mark
outer-band face bubbles as LOCAL_DOF so that machinery can eliminate them.
Here condensation happens at the assembled-matrix level: the LOCAL block is
factored sparsely ONCE (it is (block-)diagonal-dominated and much smaller
than the full system), the coupled system is solved on the remaining dofs,
and the local dofs are recovered by backsubstitution.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import config


def condensed_solve(A, b, local_dofs, freedofs=None, solver=None):
    """Solve A x = b by eliminating `local_dofs` via a Schur complement.

    A : SparseMatrix;  b : (n,) vector;  local_dofs/freedofs : bool masks.
    solver(mat_scipy, rhs) -> x solves the condensed coupled system; default
    is a sparse LU.  Returns the FULL solution vector (local dofs recovered).
    """
    from scipy.sparse.linalg import splu

    n = A.shape[0]
    loc = np.asarray(local_dofs.np if hasattr(local_dofs, "np") else local_dofs)
    free = (np.ones(n, bool) if freedofs is None
            else np.asarray(freedofs.np if hasattr(freedofs, "np") else freedofs))
    loc = loc & free
    coup = free & ~loc
    bn = np.asarray(b, dtype=np.float64)

    S = A.to_scipy().tocsr()
    iL = np.nonzero(loc)[0]
    iC = np.nonzero(coup)[0]
    A_LL = S[iL][:, iL].tocsc()
    A_CL = S[iC][:, iL].tocsr()
    A_LC = S[iL][:, iC].tocsr()
    A_CC = S[iC][:, iC].tocsr()

    lu_LL = splu(A_LL.astype(np.float64))
    # Schur rhs: b_C - A_CL A_LL^{-1} b_L
    zL = lu_LL.solve(bn[iL]) if len(iL) else np.zeros(0)
    rhs = bn[iC] - (A_CL @ zL if len(iL) else 0.0)
    # condensed operator: A_CC - A_CL A_LL^{-1} A_LC (applied via LU)
    if solver is None:
        from scipy.sparse.linalg import LinearOperator, cg as scipy_cg

        def mv(x):
            y = A_CC @ x
            if len(iL):
                y = y - A_CL @ lu_LL.solve(A_LC @ x)
            return y

        op = LinearOperator((len(iC), len(iC)), matvec=mv, dtype=np.float64)
        diag = np.maximum(np.abs(A_CC.diagonal()), 1e-30)
        M = LinearOperator((len(iC), len(iC)),
                           matvec=lambda r: r / diag, dtype=np.float64)
        xC, info = scipy_cg(op, rhs, rtol=1e-12, maxiter=20 * len(iC) + 100, M=M)
        if info != 0:
            raise RuntimeError(f"condensed CG did not converge (info={info})")
    else:
        # custom solver receives the EXPLICIT Schur complement
        # A_CC - A_CL A_LL^{-1} A_LC (not just A_CC — the correction term
        # is what condensation is about); built densely through the LU,
        # fine for the moderate coupled blocks condensation targets
        S_cc = A_CC
        if len(iL):
            from scipy.sparse import csr_matrix

            X = lu_LL.solve(A_LC.toarray())  # (nL, nC)
            S_cc = A_CC - csr_matrix(A_CL @ X)
        xC = solver(S_cc, rhs)

    out = np.zeros(n, dtype=np.float64)
    out[iC] = xC
    if len(iL):
        out[iL] = lu_LL.solve(bn[iL] - A_LC @ xC)
    return jnp.asarray(out, dtype=config.dtype)
