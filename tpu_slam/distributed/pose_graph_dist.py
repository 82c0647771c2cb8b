"""Distributed pose-graph Gauss-Newton: edge-sharded PCG over the mesh.

The SP-analog of SURVEY.md §2.3: long trajectories produce graphs whose
dominant cost is the per-edge work (residuals, Jacobians, Hv products).
Sharding:

  * edges — sharded across the ``graph`` mesh axis (the heavy axis);
  * poses / CG vectors — replicated (N x 6 floats: 2.4 MB at 100k poses,
    cheap against ICI bandwidth), reduced with ``psum``.

Every CG iteration is: local gathers over device-resident edges, batched
6x6 matmuls, one psum of the (N, 6) partial Hv, and two psum'd scalars for
the CG dot products. XLA maps the psums onto ICI all-reduces.

This mirrors graph.pose_graph exactly (same residuals/Jacobians — shared
helpers), so single-device and distributed solves agree to float tolerance.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tpu_slam.core import se3
from tpu_slam.graph.pose_graph import (GraphSolveParams, PoseGraph,
                                       _edge_residual_jac_batch)


def _local_edge_terms(poses, edge_i, edge_j, edge_T, edge_info, edge_mask):
    Ti = jnp.take(poses, edge_i, axis=0)
    Tj = jnp.take(poses, edge_j, axis=0)
    r, Jj = _edge_residual_jac_batch(Ti, Tj, edge_T)
    info = edge_info * edge_mask.astype(r.dtype)[:, None, None]
    return r, Jj, info


def optimize_pose_graph_sharded(
    mesh: Mesh,
    graph: PoseGraph,
    params: GraphSolveParams = GraphSolveParams(),
    axis_name: str = None,
) -> Tuple[PoseGraph, jax.Array]:
    """GN with edge-sharded PCG. Edge capacity must divide the mesh size
    evenly (pad the graph's edge arrays; masked edges contribute zeros)."""
    if axis_name is None:
        axis_name = mesh.axis_names[0]
    n_dev = mesh.shape[axis_name]
    E = graph.edge_capacity
    if E % n_dev != 0:
        raise ValueError(f"edge capacity {E} not divisible by mesh size "
                         f"{n_dev}; pad the graph")
    n = graph.node_capacity

    @functools.partial(
        jax.shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(), P(axis_name), P(axis_name), P(axis_name),
                  P(axis_name), P(axis_name)),
        out_specs=(P(), P()))
    def gn_sharded(poses, edge_i, edge_j, edge_T, edge_info, edge_mask):
        """One complete GN solve on sharded edges; returns (poses, chi2)."""

        def edge_terms(p):
            return _local_edge_terms(p, edge_i, edge_j, edge_T, edge_info,
                                     edge_mask)

        def build_rhs_diag(p):
            r, Jj, info = edge_terms(p)
            WJ = jnp.einsum("eab,ebc->eac", info, Jj)
            Wr = jnp.einsum("eab,eb->ea", info, r)
            JtWr_j = jnp.einsum("eba,eb->ea", Jj, Wr)
            b = jnp.zeros((n, 6), r.dtype)
            b = b.at[edge_i].add(JtWr_j)
            b = b.at[edge_j].add(-JtWr_j)
            b = jax.lax.psum(b, axis_name)

            JtWJ = jnp.einsum("eba,ebc->eac", Jj, WJ)
            diag = jnp.zeros((n, 6, 6), r.dtype)
            diag = diag.at[edge_i].add(JtWJ)
            diag = diag.at[edge_j].add(JtWJ)
            diag = jax.lax.psum(diag, axis_name)
            diag = diag.at[0].add(params.prior_weight
                                  * jnp.eye(6, dtype=r.dtype))
            diag = diag + params.damping * jnp.eye(6, dtype=r.dtype)
            return b, diag, (r, Jj, info)

        def hv(terms, v):
            r, Jj, info = terms
            vi = jnp.take(v, edge_i, axis=0)
            vj = jnp.take(v, edge_j, axis=0)
            u = jnp.einsum("eab,eb->ea", Jj, vj - vi)
            Wu = jnp.einsum("eab,eb->ea", info, u)
            JtWu = jnp.einsum("eba,eb->ea", Jj, Wu)
            out = jnp.zeros_like(v)
            out = out.at[edge_i].add(-JtWu)
            out = out.at[edge_j].add(JtWu)
            out = jax.lax.psum(out, axis_name)
            out = out.at[0].add(params.prior_weight * v[0])
            return out + params.damping * v

        def pcg(terms, b, diag):
            Minv = jnp.linalg.inv(diag)
            precond = lambda x: jnp.einsum("nab,nb->na", Minv, x)
            dot = lambda a, c: jnp.sum(a * c)

            x0 = jnp.zeros_like(b)
            r0 = b - hv(terms, x0)
            z0 = precond(r0)
            state0 = (x0, r0, z0, dot(r0, z0), jnp.int32(0))

            def cond(s):
                _, r_, _, _, it = s
                return (it < params.cg_iterations) & (dot(r_, r_)
                                                      > params.cg_tolerance)

            def body(s):
                x, r_, p, rz, it = s
                Hp = hv(terms, p)
                alpha = rz / jnp.maximum(dot(p, Hp), 1e-30)
                x = x + alpha * p
                r_ = r_ - alpha * Hp
                z = precond(r_)
                rz_new = dot(r_, z)
                beta = rz_new / jnp.maximum(rz, 1e-30)
                return (x, r_, z + beta * p, rz_new, it + 1)

            x, *_ = jax.lax.while_loop(cond, body, state0)
            return x

        def gn_step(p, _):
            b, diag, terms = build_rhs_diag(p)
            xi = pcg(terms, b, diag)
            live = (jnp.arange(n) < graph.n_nodes)[:, None]
            xi = jnp.where(live, xi, 0.0)
            p_new = jax.vmap(se3.retract, in_axes=(0, 0))(p, xi)
            return p_new, None

        poses_out, _ = jax.lax.scan(gn_step, poses, None,
                                    length=params.gn_iterations)
        r, _, info = edge_terms(poses_out)
        chi2 = jax.lax.psum(
            jnp.sum(jnp.einsum("ea,eab,eb->e", r, info, r)), axis_name)
        return poses_out, chi2

    poses, chi2 = gn_sharded(graph.poses, graph.edge_i, graph.edge_j,
                             graph.edge_T, graph.edge_info, graph.edge_mask)
    return dataclasses.replace(graph, poses=poses), chi2
