from . import stencil, smoothers, transfer, galerkin, nearnull, norms
