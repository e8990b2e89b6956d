"""The generative label model: matrix-completion / SGD fit over LF
accuracies and correlations (SURVEY.md §2.7 G1–G7).

Reference semantics: ``GenerativeModel.train`` fits LF accuracy (and
dependency) factors by SGD with Gibbs-sampled gradients
(⚠ snorkel/learning/gen_learning.py::GenerativeModel ~L60–520,
reconstructed — SURVEY.md §0); north_star explicitly names the
matrix-completion formulation of Snorkel MeTaL (Ratner et al., AAAI'19)
as the target: fit μ = E[ψ | Y] from the second-moment matrix O by
minimizing ‖mask ⊙ (O − μ P μᵀ)‖²_F.

Division of labor (the architectural win over the reference —
SURVEY.md §3.1 step E3):
- distributed: O (two-phase aggregation, see encoding.py) — one pass.
- driver: this module's pure-NumPy full-batch Adam on a (m·k)² problem
  — O(1) in corpus size, deterministic (no sampling anywhere), so
  hyperparameter search (G7) refits WITHOUT re-scanning the corpus.
- distributed again: marginals = a broadcast-joined factor table +
  one hash aggregation — **no Python at all** on the scoring path.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EPS = 1e-6


@dataclass
class LabelModel:
    m: int
    cardinality: int = 2
    class_balance: np.ndarray | None = None
    mu: np.ndarray | None = None          # (d, k): μ[(j,c'),c] = P(λ_j → c' | Y=c)
    deps: set[tuple[int, int]] = field(default_factory=set)

    # ---- G1: fit ----------------------------------------------------
    def fit(
        self,
        C: np.ndarray,
        n: int,
        lr: float = 0.02,
        epochs: int = 2000,
        prec_init: float = 0.7,
        l2: float = 0.0,
        seed: int = 42,
        constrain_coverage: bool = False,
    ) -> "LabelModel":
        """Full-batch Adam on ‖M ⊙ (O − μPμᵀ)‖² (deterministic: the
        'SGD' of the paper is full-batch here because O is tiny).

        ``constrain_coverage``: project μ after every step onto the
        affine subspace Σ_c p_c μ[(j,c'),c] = P(λ_j = c') = diag(O) —
        the observed per-LF vote rates.  This removes the inflation
        freedom where the fit explains a strongly coupled
        (unmasked-dependent) LF block by overstating those LFs'
        coverage/accuracy while writing off honest blocks — the failure
        that makes unconstrained structure search misattribute
        dependencies (``select_dependencies_greedy`` turns it on).
        Exact additive projection (closed form for a single linear
        constraint per row), then box clip.  Leave OFF (default) when
        O's denominator counts only LABELED candidates (the long-form
        ``compute_O_selfjoin`` path): conditioning on 'some LF fired'
        is a collider that shifts the observed vote rates, and pinning
        μ to them then biases the accuracies the slack would absorb.
        """
        k = self.cardinality
        d = self.m * k
        O = C.astype(np.float64) / max(n, 1)
        p = (
            np.asarray(self.class_balance, dtype=np.float64)
            if self.class_balance is not None
            else np.full(k, 1.0 / k)
        )
        P = np.diag(p)
        # mask: off-diagonal LF blocks, minus learned dependencies (G4)
        M = np.ones((d, d))
        for j in range(self.m):
            M[j * k : (j + 1) * k, j * k : (j + 1) * k] = 0.0
        for (j1, j2) in self.deps:
            M[j1 * k : (j1 + 1) * k, j2 * k : (j2 + 1) * k] = 0.0
            M[j2 * k : (j2 + 1) * k, j1 * k : (j1 + 1) * k] = 0.0
        # init: consistent with observed coverage, biased to prec_init
        diag = np.clip(np.diag(O), EPS, 1.0)
        mu = np.zeros((d, k))
        for j in range(self.m):
            for cp in range(k):
                a = j * k + cp
                for c in range(k):
                    w = prec_init if c == cp else (1.0 - prec_init) / max(k - 1, 1)
                    mu[a, c] = diag[a] * w / max(p[c], EPS)
        mu = np.clip(mu, EPS, 1 - EPS)
        # Adam (deterministic full-batch)
        mt = np.zeros_like(mu)
        vt = np.zeros_like(mu)
        b1, b2, eps = 0.9, 0.999, 1e-8
        pp = float(p @ p)
        for t in range(1, epochs + 1):
            delta = M * (O - mu @ P @ mu.T)
            grad = -2.0 * (delta + delta.T) @ mu @ P + 2.0 * l2 * mu
            mt = b1 * mt + (1 - b1) * grad
            vt = b2 * vt + (1 - b2) * grad * grad
            step = lr * (mt / (1 - b1**t)) / (np.sqrt(vt / (1 - b2**t)) + eps)
            mu = mu - step
            if constrain_coverage:
                mu = mu + ((diag - mu @ p) / pp)[:, None] * p[None, :]
            mu = np.clip(mu, EPS, 1 - EPS)
        self.mu = mu
        self.class_balance = p
        return self

    # ---- G3: learned LF stats ---------------------------------------
    def learned_lf_stats(self) -> list[dict]:
        """Per-LF learned accuracy / coverage from μ̂ (⚠ gen_learning.py
        ~L520–560)."""
        k = self.cardinality
        p = self.class_balance
        out = []
        for j in range(self.m):
            block = self.mu[j * k : (j + 1) * k, :]  # rows: voted class, cols: true class
            cov = float(np.sum(p * block.sum(axis=0)))
            correct = float(np.sum(p * np.diag(block)))
            out.append(
                {
                    "lf_id": j,
                    "learned_coverage": cov,
                    "learned_accuracy": correct / cov if cov > 0 else float("nan"),
                }
            )
        return out

    # ---- G2: marginals ------------------------------------------------
    def factor_table(self, spark: SparkSession) -> DataFrame:
        """(lf_id, label, c, log_mu) as a DataFrame — an inspection /
        export view of the learned factors.  NOT on the scoring path
        since r06: ``marginals`` inlines these values as a literal map
        (no Python-RDD scan, no broadcast)."""
        k = self.cardinality
        rows = []
        for j in range(self.m):
            for cp in range(k):
                label = (-1 if cp == 0 else 1) if k == 2 else cp + 1
                for c in range(k):
                    rows.append((j, label, c, float(np.log(max(self.mu[j * k + cp, c], EPS)))))
        return spark.createDataFrame(rows, "lf_id int, label int, c int, log_mu double")

    def marginals(self, spark: SparkSession, L: DataFrame) -> DataFrame:
        """P(Y=c | Λ) per candidate — literal factor-map lookup + ONE
        hash agg + row-local softmax; zero Python, one shuffle on
        candidate_id.

        The factor table is tiny (m·k² doubles) and fully known on the
        driver, so instead of materializing it as a DataFrame (which
        costs a Python-RDD scan + a BroadcastExchange) it is inlined as
        a literal ``map<int, array<double>>`` probed per label row:
        key = lf_id·1000 + label (collision-free for cardinality < 999).
        Rows with no factor entry are dropped (same semantics as the
        former inner join); the per-class sums replace the former
        ``pivot``, which planned TWO exchanges (candidate_id+c, then
        candidate_id) — this plans exactly one.
        """
        k = self.cardinality
        logp = [float(np.log(max(b, EPS))) for b in self.class_balance]
        entries: list[F.Column] = []
        for j in range(self.m):
            for cp in range(k):
                label = (-1 if cp == 0 else 1) if k == 2 else cp + 1
                entries.append(F.lit(j * 1000 + label))
                entries.append(
                    F.array(
                        *[
                            F.lit(float(np.log(max(self.mu[j * k + cp, c], EPS))))
                            for c in range(k)
                        ]
                    )
                )
        lmu_map = F.create_map(*entries)
        key = (F.col("lf_id").cast("long") * 1000 + F.col("label")).cast("int")
        scores = (
            L.select("candidate_id", F.element_at(lmu_map, key).alias("_lmu"))
            .filter(F.col("_lmu").isNotNull())
            .groupBy("candidate_id")
            .agg(
                *[
                    F.sum(F.element_at("_lmu", c + 1)).alias(str(c))
                    for c in range(k)
                ]
            )
        )
        # softmax over (log balance + per-class log-likelihood)
        terms = [
            (F.coalesce(F.col(str(c)), F.lit(0.0)) + F.lit(logp[c])).alias(f"s{c}")
            for c in range(k)
        ]
        sc = scores.select("candidate_id", *terms)
        mx = F.greatest(*[F.col(f"s{c}") for c in range(k)])
        exps = [F.exp(F.col(f"s{c}") - mx).alias(f"e{c}") for c in range(k)]
        sc = sc.select("candidate_id", *exps)
        tot = sum(F.col(f"e{c}") for c in range(k))
        probs = sc.select(
            "candidate_id",
            F.array(*[(F.col(f"e{c}") / tot) for c in range(k)]).alias("probs"),
        )
        if k == 2:
            probs = probs.withColumn("prob_true", F.element_at("probs", 2))
        return probs

    def marginals_local(self, L_dense: np.ndarray) -> np.ndarray:
        """NumPy oracle twin of ``marginals`` (same math, dense input)."""
        n, m = L_dense.shape
        k = self.cardinality
        logmu = np.log(np.clip(self.mu, EPS, None))  # (d, k)
        s = np.tile(np.log(np.clip(self.class_balance, EPS, None)), (n, 1))
        for j in range(m):
            col = L_dense[:, j]
            for cp in range(k):
                label = (-1 if cp == 0 else 1) if k == 2 else cp + 1
                hit = col == label
                if hit.any():
                    s[hit] += logmu[j * k + cp, :]
        s -= s.max(axis=1, keepdims=True)
        e = np.exp(s)
        return e / e.sum(axis=1, keepdims=True)


# ---- G5: majority vote ------------------------------------------------
def majority_vote(L: DataFrame) -> DataFrame:
    """Binary majority vote: P(true) ∈ {0, 0.5, 1} by vote sum sign
    (v0.9 ``MajorityLabelVoter`` idiom, SURVEY.md §2.7 G5)."""
    return (
        L.groupBy("candidate_id")
        .agg(F.sum("label").alias("vote_sum"))
        .select(
            "candidate_id",
            F.when(F.col("vote_sum") > 0, 1.0)
            .when(F.col("vote_sum") < 0, 0.0)
            .otherwise(0.5)
            .alias("prob_true"),
        )
    )


# ---- G6: scorer ---------------------------------------------------------
def score_marginals(marginals: DataFrame, gold: DataFrame, b: float = 0.5) -> dict:
    """``MentionScorer`` (⚠ snorkel/learning/utils.py ~L180–300): binary
    P/R/F1 of thresholded marginals vs gold — one aggregation."""
    g = gold.select("candidate_id", F.col("label").alias("gold_label"))
    joined = marginals.join(g, "candidate_id")
    row = joined.agg(
        F.sum(((F.col("prob_true") > b) & (F.col("gold_label") == 1)).cast("int")).alias("tp"),
        F.sum(((F.col("prob_true") > b) & (F.col("gold_label") == -1)).cast("int")).alias("fp"),
        F.sum(((F.col("prob_true") <= b) & (F.col("gold_label") == -1)).cast("int")).alias("tn"),
        F.sum(((F.col("prob_true") <= b) & (F.col("gold_label") == 1)).cast("int")).alias("fn"),
    ).collect()[0]
    tp, fp, tn, fn = row["tp"] or 0, row["fp"] or 0, row["tn"] or 0, row["fn"] or 0
    prec = tp / (tp + fp) if tp + fp else 0.0
    rec = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    acc = (tp + tn) / max(tp + fp + tn + fn, 1)
    return {"tp": tp, "fp": fp, "tn": tn, "fn": fn,
            "precision": prec, "recall": rec, "f1": f1, "accuracy": acc}


# ---- G4: dependency selection -------------------------------------------
def select_dependencies(
    C: np.ndarray, n: int, m: int, cardinality: int = 2, threshold: float = 0.05
) -> set[tuple[int, int]]:
    """Correlation screen on O (SURVEY.md §2.7 G4 v1 of the ICML'17
    structure learner): flag LF pairs whose joint-vote cell deviates
    from independence by > threshold."""
    k = cardinality
    O = C.astype(np.float64) / max(n, 1)
    diag = np.diag(O)
    deps: set[tuple[int, int]] = set()
    for j1 in range(m):
        for j2 in range(j1 + 1, m):
            dev = 0.0
            for c1 in range(k):
                for c2 in range(k):
                    a, b2 = j1 * k + c1, j2 * k + c2
                    dev = max(dev, abs(O[a, b2] - diag[a] * diag[b2]))
            if dev > threshold:
                deps.add((j1, j2))
    return deps


def select_dependencies_conditional(
    C: np.ndarray,
    n: int,
    m: int,
    cardinality: int = 2,
    threshold: float = 0.05,
    class_balance=None,
) -> tuple[set[tuple[int, int]], np.ndarray]:
    """G4 v2 — CONDITIONAL-independence screen (the ICML'17 structure-
    learning target: λ_j ⊥ λ_k GIVEN Y, not marginal independence).

    Leave-one-block-out residual test: for each LF pair, refit μ̂ with
    that pair's off-diagonal block MASKED (so the fit cannot absorb the
    dependency by inflating the pair's accuracies — a plain joint-fit
    residual gets diluted across blocks by the least-squares
    compromise), then measure how far the held-out observed block sits
    from the model's implied second moment μ̂ P μ̂ᵀ.  Under
    λ_j ⊥ λ_k | Y the held-out block is predicted to sampling noise;
    a true dependency leaves an O(coverage²) gap, while pairs that are
    merely both correlated with Y (which fool the marginal screen in
    ``select_dependencies``) are explained by μ̂ and stay quiet.
    Deterministic — no Gibbs sampling; m(m−1)/2 refits of a (m·k)²
    problem, each O(1) in corpus size (⚠ the reference optimizes the
    equivalent pseudolikelihood objective by sampled SGD:
    snorkel/learning/structure/gen_learning.py, reconstructed).

    Returns (deps, max-deviation matrix indexed [j1, j2]).
    """
    k = cardinality
    O = C.astype(np.float64) / max(n, 1)
    deps: set[tuple[int, int]] = set()
    dev = np.zeros((m, m))
    for j1 in range(m):
        for j2 in range(j1 + 1, m):
            lm = LabelModel(
                m=m, cardinality=k, class_balance=class_balance, deps={(j1, j2)}
            ).fit(C, n)
            expected = lm.mu @ np.diag(lm.class_balance) @ lm.mu.T
            block = np.abs(
                O[j1 * k : (j1 + 1) * k, j2 * k : (j2 + 1) * k]
                - expected[j1 * k : (j1 + 1) * k, j2 * k : (j2 + 1) * k]
            )
            dev[j1, j2] = block.max()
            if dev[j1, j2] > threshold:
                deps.add((j1, j2))
    return deps, dev


def _block_dev_matrix(
    O: np.ndarray, lm: "LabelModel", m: int, k: int
) -> np.ndarray:
    """Per-pair max |O − μ̂Pμ̂ᵀ| over the (j1, j2) off-diagonal block,
    upper-triangular (the deviation statistic every screen uses)."""
    expected = lm.mu @ np.diag(lm.class_balance) @ lm.mu.T
    D = np.zeros((m, m))
    for j1 in range(m):
        for j2 in range(j1 + 1, m):
            D[j1, j2] = float(
                np.abs(
                    O[j1 * k : (j1 + 1) * k, j2 * k : (j2 + 1) * k]
                    - expected[j1 * k : (j1 + 1) * k, j2 * k : (j2 + 1) * k]
                ).max()
            )
    return D


def select_dependencies_greedy(
    C: np.ndarray,
    n: int,
    m: int,
    cardinality: int = 2,
    threshold: float = 0.05,
    grow_tol: float = 0.01,
    class_balance=None,
    max_deps: int | None = None,
) -> tuple[set[tuple[int, int]], list[frozenset[int]]]:
    """G4 v3 — grow-prune block-masking structure learner with clique
    extraction (the 'higher-order structures' extension of
    ``select_dependencies_conditional``).

    GROW: repeatedly fit with the current dependency set masked and
    mask the worst-deviating remaining block, until every unmasked
    block fits within ``grow_tol`` (≈ the sampling-noise floor).
    PRUNE: while the weakest held-out block deviates < ``threshold``
    under the full mask, unmask it (false positives greedily picked up
    while μ̂ was still distorted are removed once the real structure is
    masked).  Internal refits run with ``constrain_coverage=True``:
    without the observed vote-rate constraint, the least-squares fit
    can explain a coupled clique by inflating those LFs' coverage/
    accuracy and write off the honest blocks instead, sending any
    deviation-guided search to the wrong pairs — so pass ``n`` counting
    the FULL candidate set (see ``fit``'s collider caveat).
    Deterministic; O(#deps · m²/2) fits of a (m·k)²
    problem, each O(1) in corpus size (⚠ the reference optimizes a
    pseudolikelihood objective with sampled SGD and also parameterizes
    only pairwise factor types —
    snorkel/learning/structure/gen_learning.py, reconstructed).

    Returns ``(deps, cliques)`` where ``cliques`` lists the maximal
    cliques of size ≥ 3 in the selected dependency graph — e.g. three
    mutually-coupled LFs surface as one 3-clique, the higher-order
    structure the pairwise list alone obscures (pairwise screens go
    blind inside a clique: the sibling edges keep μ̂ inflated so each
    held-out edge looks explained).  Couplings visible only in THIRD
    moments with pairwise conditional independence (XOR-style) are
    outside any second-moment fit — same factor family limit as the
    reference's pairwise dependency types.
    """
    k = cardinality
    O = C.astype(np.float64) / max(n, 1)
    deps: set[tuple[int, int]] = set()
    n_pairs = m * (m - 1) // 2
    # cap: keep at least half the blocks in the objective so μ̂ stays
    # identifiable
    cap = max_deps if max_deps is not None else n_pairs // 2

    def refit() -> "LabelModel":
        return LabelModel(
            m=m, cardinality=k, class_balance=class_balance, deps=set(deps)
        ).fit(C, n, constrain_coverage=True)

    while len(deps) < cap:
        D = _block_dev_matrix(O, refit(), m, k)
        for (j1, j2) in deps:
            D[j1, j2] = -1.0
        worst = np.unravel_index(np.argmax(D), D.shape)
        if D[worst] <= grow_tol:
            break
        deps.add((int(worst[0]), int(worst[1])))
    while deps:
        D = _block_dev_matrix(O, refit(), m, k)
        weakest = min(deps, key=lambda pr: D[pr])
        if D[weakest] >= threshold:
            break
        deps.discard(weakest)
    return deps, dependency_cliques(deps, min_size=3)


def dependency_cliques(
    deps: set[tuple[int, int]], min_size: int = 3
) -> list[frozenset[int]]:
    """Maximal cliques of the dependency graph (Bron–Kerbosch, tiny m),
    filtered to ≥ ``min_size`` members — the multi-LF coupling view."""
    adj: dict[int, set[int]] = {}
    for a, b in deps:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out: list[frozenset[int]] = []

    def bk(r: set[int], p: set[int], x: set[int]):
        if not p and not x:
            if len(r) >= min_size:
                out.append(frozenset(r))
            return
        for v in sorted(p):
            bk(r | {v}, p & adj[v], x & adj[v])
            p = p - {v}
            x = x | {v}

    bk(set(), set(adj), set())
    return sorted(out, key=lambda c: (-len(c), sorted(c)))


# ---- G7: grid search ------------------------------------------------------
def grid_search(
    C: np.ndarray,
    n: int,
    m: int,
    spark: SparkSession,
    L: DataFrame,
    dev_gold: DataFrame,
    param_grid: list[dict],
    cardinality: int = 2,
    class_balance=None,
    metric: str = "f1",
) -> tuple[LabelModel, dict, list[dict]]:
    """Refit per config from the SAME sufficient statistics — no corpus
    re-scan (⚠ snorkel/learning/utils.py::GridSearch ~L300–450; the
    reference re-runs Gibbs per config)."""
    results = []
    best, best_cfg, best_val = None, None, -1.0
    for cfg in param_grid:
        lm = LabelModel(m=m, cardinality=cardinality, class_balance=class_balance)
        lm.fit(C, n, **cfg)
        sc = score_marginals(lm.marginals(spark, L), dev_gold)
        results.append({**cfg, **sc})
        if sc[metric] > best_val:
            best, best_cfg, best_val = lm, cfg, sc[metric]
    return best, best_cfg, results
