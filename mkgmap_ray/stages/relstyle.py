"""Relation→member style application: the reference's ``apply`` action
plus ``RelationStyleHook``.

Reference semantics (``osmstyle/actions/SubAction.java:46-71``): a
relation rule's ``apply [role=X] { ... }`` / ``apply_once`` block runs
its sub-actions on every member element (optionally role-filtered;
``once`` dedupes repeated members); inside the block ``${x}`` reads the
MEMBER's tags and ``$(x)`` the RELATION's (``setValueTags``,
``ValueBuilder.java:60-90``). ``RelationStyleHook`` runs the relation
rules over all relations before element conversion
(``reader/osm/RelationStyleHook.java:41-50``).

Ray-Data shape: relation rules run vectorized over the relations table
(one ``map_batches`` pass); each fired apply block becomes PATCH rows
``(mtype, mref, prog, seq, $()-values)`` — only these tiny rows shuffle,
never relation or member payloads. Members hash-partition by id; inside
each partition patches apply in ranked rounds (round k = each member's
k-th patch in global order), one vectorized pass per program per round,
so the work is bounded by max-relations-per-member × programs, not rows.

Global patch order mirrors the reference's deterministic iteration
(relations in id order; within a relation, rules then members in order):
``seq = rel_id << 24 | prog << 16 | member_idx`` (documented assumption:
< 2^8 apply programs per style, < 2^16 members per relation).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..style.rules import ACCESS_TAGS, RuleSet, _substitute

N_PARTS = 256


def apply_subactions(tags: dict[str, pd.Series], n: int, actions,
                     mask: np.ndarray) -> None:
    """Run an apply block's sub-actions over ``n`` member rows where
    ``mask`` is set, mutating ``tags`` in place. ``tags`` must already
    contain the shipped ``__rel__*`` columns for ``$()`` substitution."""
    for a in actions:
        if a.kind == "delete":
            if a.key in tags:
                tags[a.key] = tags[a.key].mask(mask)
            continue
        val = _substitute(a.value, tags, n)
        put = mask & val.notna().to_numpy()
        if a.kind == "set":
            col = tags.get(a.key)
            if col is None:
                col = pd.Series([pd.NA] * n, dtype="string")
            tags[a.key] = col.mask(put, val)
        elif a.kind == "add":
            col = tags.get(a.key)
            if col is None:
                col = pd.Series([pd.NA] * n, dtype="string")
            tags[a.key] = col.mask(put & col.isna().to_numpy(), val)
        elif a.kind == "addaccess":
            for k in ACCESS_TAGS:
                col = tags.get(k)
                if col is None:
                    col = pd.Series([pd.NA] * n, dtype="string")
                tags[k] = col.mask(put, val)


def subaction_out_tags(ruleset: RuleSet) -> list[str]:
    """Member tag columns the style's apply blocks may create/mutate —
    fixes the output schema across partitions."""
    out: set[str] = set()
    for a in ruleset.apply_programs():
        for s in a.sub:
            if s.kind == "addaccess":
                out |= set(ACCESS_TAGS)
            elif s.key:
                out.add(s.key)
    return sorted(out)


def member_ref_tags(ruleset: RuleSet) -> list[str]:
    """Member tags read by ``${x}`` substitutions inside apply blocks
    (needed as input columns on the member side)."""
    from ..style.rules import _SUB_RE

    out: set[str] = set()
    for a in ruleset.apply_programs():
        for s in a.sub:
            for spec in _SUB_RE.findall(s.value):
                t = spec.split("|", 1)[0]
                if not t.startswith("__rel__"):
                    out.add(t)
    return sorted(out)


def relation_patches(batch: pa.Table, ruleset: RuleSet,
                     rel_tag_cols: dict[str, str] | None = None
                     ) -> pd.DataFrame:
    """One batch of the relations table (``id``, ``member_types``,
    ``member_refs``, ``member_roles``, ``tag_keys``/``tag_vals``) →
    patch rows. Relation tags used by the rules are extracted from the
    key/value list columns (or taken from pre-extracted columns via
    ``rel_tag_cols``)."""
    from ..sources.osmxml import tag_column

    rid = np.asarray(batch["id"].combine_chunks(), np.int64)
    n = len(rid)
    used = ruleset.used_tags()
    tags: dict[str, pd.Series] = {}
    for t in sorted(used):
        if rel_tag_cols and t in rel_tag_cols:
            tags[t] = batch[rel_tag_cols[t]].to_pandas().astype("string")
        elif "tag_keys" in batch.column_names:
            tags[t] = tag_column(batch, t).to_pandas().astype("string")
    res = ruleset.apply(tags, n)

    types = batch["member_types"].combine_chunks()
    refs = batch["member_refs"].combine_chunks()
    roles = batch["member_roles"].combine_chunks()
    offs = types.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    counts = offs[1:] - offs[:-1]
    flat_t = np.asarray(types.flatten(), np.int64)
    flat_r = np.asarray(refs.flatten(), np.int64)
    flat_role = roles.flatten().to_pandas().astype("string")

    rel_cols = sorted(
        {t for a in ruleset.apply_programs() for t in a.rel_refs}
    )
    frames = []
    for prog_id, a, idxs, relvals in res["applies"]:
        c_sel = counts[idxs]
        total = int(c_sel.sum())
        if total == 0:
            continue
        parent = np.repeat(np.arange(len(idxs)), c_sel)
        local = np.arange(total) - np.repeat(
            np.concatenate([[0], np.cumsum(c_sel)])[:-1], c_sel
        )
        flat_pos = offs[idxs][parent] + local
        mt = flat_t[flat_pos]
        mr = flat_r[flat_pos]
        keep = np.ones(total, bool)
        if a.role is not None:
            keep &= (
                flat_role.iloc[flat_pos].to_numpy(object) == a.role
            )
        df = pd.DataFrame(
            {
                "mtype": mt[keep],
                "mref": mr[keep],
                "prog": np.full(int(keep.sum()), prog_id, np.int64),
                "seq": (
                    (rid[idxs][parent[keep]] << 24)
                    | (prog_id << 16)
                    | local[keep]
                ),
                "_rel_row": idxs[parent[keep]],
            }
        )
        if a.once:
            # dedupe repeated members within one relation (SubAction's
            # HashSet) — keep the first occurrence in member order
            df = df.drop_duplicates(["_rel_row", "mtype", "mref"])
        for t in rel_cols:
            if t in a.rel_refs:
                # relvals are indexed by position within idxs
                pos_in_idxs = np.searchsorted(idxs, df["_rel_row"].to_numpy())
                df[f"__rel__{t}"] = pd.Series(
                    relvals[t][pos_in_idxs], dtype="string"
                ).to_numpy(object)
            else:
                df[f"__rel__{t}"] = pd.Series(
                    [pd.NA] * len(df), dtype="string"
                ).to_numpy(object)
        frames.append(df.drop(columns="_rel_row"))
    cols = ["mtype", "mref", "prog", "seq"] + [
        f"__rel__{t}" for t in rel_cols
    ]
    if not frames:
        out = pd.DataFrame({c: [] for c in cols})
        out = out.astype(
            {"mtype": np.int64, "mref": np.int64,
             "prog": np.int64, "seq": np.int64}
        )
        for t in rel_cols:
            out[f"__rel__{t}"] = out[f"__rel__{t}"].astype("string")
        return out
    out = pd.concat(frames, ignore_index=True)[cols]
    for t in rel_cols:
        out[f"__rel__{t}"] = out[f"__rel__{t}"].astype("string")
    return out


def apply_patches(members_ds, patches_ds, ruleset: RuleSet,
                  member_tag_cols: list[str], member_type: int,
                  id_col: str = "id"):
    """Join patch rows onto a member table and run each member's patches
    in global ``seq`` order. ``members_ds`` rows must carry ``id_col``
    plus ``member_tag_cols`` (string tag columns); returns a Dataset of
    ``id`` + all (input and apply-created) member tag columns.

    Shape: union + hash-partition on member id (same salted-groupby join
    as relation resolution) → per-partition ranked rounds, each round one
    vectorized sub-action pass per program."""
    rel_cols = sorted(
        {t for a in ruleset.apply_programs() for t in a.rel_refs}
    )
    out_tags = sorted(set(member_tag_cols) | set(subaction_out_tags(ruleset)))
    progs = ruleset.apply_programs()

    def member_side(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({"mref": np.asarray(
            batch[id_col].combine_chunks(), np.int64)})
        df["prog"] = np.int64(-1)
        df["seq"] = np.int64(-1)
        for t in rel_cols:
            df[f"__rel__{t}"] = pd.Series(
                [pd.NA] * len(df), dtype="string")
        for t in out_tags:
            if t in batch.column_names:
                df[t] = batch[t].to_pandas().astype("string")
            else:
                df[t] = pd.Series([pd.NA] * len(df), dtype="string")
        df["kind"] = np.int8(1)
        return df

    def patch_side(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["mtype"] == member_type].copy()
        b = b.drop(columns=["mtype"])
        for t in out_tags:
            b[t] = pd.Series([pd.NA] * len(b), dtype="string")
        b["kind"] = np.int8(0)
        return b

    def add_part(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["part"] = b["mref"].to_numpy(np.int64) & (N_PARTS - 1)
        return b

    def apply_group(g: pd.DataFrame) -> pd.DataFrame:
        members = g[g["kind"] == 1].sort_values("mref")
        members = members.reset_index(drop=True)
        n = len(members)
        tags = {t: members[t].astype("string") for t in out_tags}
        pat = g[g["kind"] == 0]
        if n and len(pat):
            mref_sorted = members["mref"].to_numpy(np.int64)
            pat = pat[np.isin(pat["mref"].to_numpy(np.int64), mref_sorted)]
            pat = pat.sort_values(["mref", "seq"], kind="stable")
            rank = pat.groupby("mref").cumcount().to_numpy(np.int64)
            for rnd in range(int(rank.max(initial=-1)) + 1):
                sub = pat[rank == rnd]
                for prog_id, rows in sub.groupby("prog", sort=True):
                    a = progs[int(prog_id)]
                    idx = np.searchsorted(
                        mref_sorted, rows["mref"].to_numpy(np.int64)
                    )
                    mask = np.zeros(n, bool)
                    mask[idx] = True
                    merged = dict(tags)
                    for t in a.rel_refs:
                        col = pd.Series([pd.NA] * n, dtype="string")
                        col.iloc[idx] = rows[f"__rel__{t}"].to_numpy(object)
                        merged[f"__rel__{t}"] = col
                    apply_subactions(merged, n, a.sub, mask)
                    tags = {
                        k: v for k, v in merged.items()
                        if not k.startswith("__rel__")
                    }
        out = pd.DataFrame({"id": members["mref"].to_numpy(np.int64)})
        for t in out_tags:
            out[t] = tags[t] if n else pd.Series([], dtype="string")
        return out

    unioned = (
        members_ds.map_batches(
            member_side, batch_format="pyarrow", batch_size=None
        )
        .union(
            patches_ds.map_batches(
                patch_side, batch_format="pandas", batch_size=None
            )
        )
        .map_batches(add_part, batch_format="pandas", batch_size=None)
    )
    return unioned.groupby("part").map_groups(
        apply_group, batch_format="pandas"
    )
