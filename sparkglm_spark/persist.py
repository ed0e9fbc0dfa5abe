"""Model persistence: MLWriter-style JSON for
LM/GLM/HuberLM/QuantileLM/CoxPH (SURVEY §1.5).

The reference has no persistence at all (models live as JVM objects); here
fitted models round-trip through a single JSON document — coefficients and
stats are O(k), so a plain file is the right weight. Works with any
fsspec-like local path; on a cluster, write the JSON string wherever your
artifact store lives.
"""

from __future__ import annotations

import json

import numpy as np

from sparkglm_spark.operators.enet import ElasticNetLM, GLMElasticNet
from sparkglm_spark.operators.evaluate import IsotonicCalibration
from sparkglm_spark.operators.glm import GLM
from sparkglm_spark.operators.lm import LM, HuberLM, QuantileLM
from sparkglm_spark.operators.survival import CoxPH, WeibullAFT

_FORMAT_VERSION = 1


def _arr(x) -> list[float]:
    return [float(v) for v in np.asarray(x).ravel()]


def model_to_dict(model: LM | GLM | HuberLM | QuantileLM | CoxPH) -> dict:
    if isinstance(model, IsotonicCalibration):
        return {
            "format_version": _FORMAT_VERSION,
            "kind": "isotonic",
            "score_col": model.score_col,
            "boundaries": _arr(model.boundaries),
            "predictions": _arr(model.predictions),
        }
    if isinstance(model, GLMElasticNet):
        return {
            "format_version": _FORMAT_VERSION,
            "kind": "glm_enet",
            "xnames": list(model.xnames),
            "yname": model.yname,
            "coefs": _arr(model.coefs),
            "family": model.family,
            "link": model.link,
            "reg_param": float(model.reg_param),
            "elastic_net_param": float(model.elastic_net_param),
            "standardize": bool(model.standardize),
            "deviance": float(model.deviance),
            "nrow": int(model.nrow),
            "iter": int(model.iter),
            "converged": bool(model.converged),
            "levels": {k: list(v) for k, v in model.levels.items()},
            "call": model.call,
        }
    if isinstance(model, ElasticNetLM):
        return {
            "format_version": _FORMAT_VERSION,
            "kind": "enet",
            "xnames": list(model.xnames),
            "yname": model.yname,
            "coefs": _arr(model.coefs),
            "reg_param": float(model.reg_param),
            "elastic_net_param": float(model.elastic_net_param),
            "standardize": bool(model.standardize),
            "nrow": int(model.nrow),
            "sse": float(model.sse),
            "sweeps": int(model.sweeps),
            "converged": bool(model.converged),
            "levels": {k: list(v) for k, v in model.levels.items()},
            "call": model.call,
        }
    if isinstance(model, QuantileLM):
        return {
            "format_version": _FORMAT_VERSION,
            "kind": "quantile",
            "xnames": list(model.xnames),
            "yname": model.yname,
            "coefs": _arr(model.coefs),
            "q": float(model.q),
            "iter": int(model.iter),
            "nrow": int(model.nrow),
            "converged": bool(model.converged),
            "levels": {k: list(v) for k, v in model.levels.items()},
            "call": model.call,
        }
    if isinstance(model, HuberLM):
        return {
            "format_version": _FORMAT_VERSION,
            "kind": "huber",
            "xnames": list(model.xnames),
            "yname": model.yname,
            "coefs": _arr(model.coefs),
            "scale": float(model.scale),
            "c": float(model.c),
            "iter": int(model.iter),
            "nrow": int(model.nrow),
            "converged": bool(model.converged),
            "levels": {k: list(v) for k, v in model.levels.items()},
            "call": model.call,
        }
    if isinstance(model, WeibullAFT):
        return {
            "format_version": _FORMAT_VERSION,
            "kind": "weibull_aft",
            "xnames": list(model.xnames),
            "time_col": model.time_col,
            "event_col": model.event_col,
            "coefs": _arr(model.coefs),
            "scale": float(model.scale),
            "se": _arr(model.se),
            "loglik": float(model.loglik),
            "n": int(model.n),
            "n_events": int(model.n_events),
            "iter": int(model.iter),
            "converged": bool(model.converged),
            "cov_params": None
            if model.cov_params is None
            else [[float(v) for v in row] for row in np.asarray(model.cov_params)],
            "weight_col": model.weight_col,
            "strata_col": model.strata_col,
            # pairs, not a dict: JSON coerces mapping keys to strings,
            # which would silently retype integer strata on reload
            "scales": None
            if model.scales is None
            else [[k, float(v)] for k, v in model.scales.items()],
            # r14: the survreg error distribution — absent ⇒ weibull
            # (pre-r14 payloads load unchanged)
            "dist": model.dist,
        }
    if isinstance(model, CoxPH):
        return {
            "format_version": _FORMAT_VERSION,
            "kind": "coxph",
            "xnames": list(model.xnames),
            "time_col": model.time_col,
            "event_col": model.event_col,
            "coefs": _arr(model.coefs),
            "se": _arr(model.se),
            "loglik": float(model.loglik),
            "null_loglik": float(model.null_loglik),
            "n": int(model.n),
            "n_events": int(model.n_events),
            "iter": int(model.iter),
            "converged": bool(model.converged),
            "cov_params": None
            if model.cov_params is None
            else [[float(v) for v in row] for row in np.asarray(model.cov_params)],
            "time_bucket": model.time_bucket,
            "strata_col": model.strata_col,
            "weight_col": model.weight_col,
            "entry_col": model.entry_col,
        }
    kind = "lm" if isinstance(model, LM) else "glm"
    d = {
        "format_version": _FORMAT_VERSION,
        "kind": kind,
        "xnames": list(model.xnames),
        "yname": model.yname,
        "coefs": _arr(model.coefs),
        "std_err": _arr(model.std_err),
        "nrow": int(model.nrow),
        "levels": {k: list(v) for k, v in model.levels.items()},
        "call": model.call,
    }
    if kind == "lm":
        d.update(
            sigma=model.sigma,
            r2=model.r2,
            f_stat=model.f_stat,
            # fit-flavor flags — the OLS-only paths (influence, intervals,
            # sandwich SEs) re-check these after a round-trip
            weighted=bool(model.weighted),
            l2_penalty=float(model.l2_penalty),
        )
        if model.cov_params is not None:
            # k×k — tiny; enables predict(interval=...) after a round-trip
            d["cov_params"] = [
                [float(v) for v in row] for row in np.asarray(model.cov_params)
            ]
    else:
        d.update(
            family=model.family,
            link=model.link,
            deviance=model.deviance,
            null_deviance=model.null_deviance,
            df_residual=model.df_residual,
            df_null=model.df_null,
            p_dispersion=model.p_dispersion,
            pearson=model.pearson,
            loglik=model.loglik,
            aic=model.aic,
            iter=int(model.iter),
        )
        if model.cov_params is not None:
            d["cov_params"] = [
                [float(v) for v in row] for row in np.asarray(model.cov_params)
            ]
        # glm_nb extras (r14): θ̂/SE(θ)/α̂/outer count ride as optional
        # keys — absent for plain glm fits, restored verbatim on load.
        # se_theta rides WHENEVER theta does, as an explicit null when
        # the info was degenerate (θ clamped on equidispersed data) —
        # a loaded model must expose .se_theta or the summary θ line
        # crashes (review r14 #1)
        if getattr(model, "theta", None) is not None:
            d["theta"] = float(model.theta)
            se_t = getattr(model, "se_theta", None)
            d["se_theta"] = None if se_t is None else float(se_t)
            v = getattr(model, "nb_alpha", None)
            if v is not None:
                d["nb_alpha"] = float(v)
            v = getattr(model, "outer_iter", None)
            if v is not None:
                d["outer_iter"] = int(v)
    return d


def model_from_dict(d: dict) -> LM | GLM | HuberLM | QuantileLM | CoxPH:
    if d.get("format_version") != _FORMAT_VERSION:
        raise ValueError(f"unsupported model format {d.get('format_version')!r}")
    if d["kind"] == "isotonic":
        return IsotonicCalibration(
            boundaries=d["boundaries"],
            predictions=d["predictions"],
            score_col=d["score_col"],
        )
    if d["kind"] == "glm_enet":
        return GLMElasticNet(
            xnames=list(d["xnames"]),
            yname=d["yname"],
            coefs=np.asarray(d["coefs"], dtype=np.float64),
            family=d["family"],
            link=d["link"],
            reg_param=float(d["reg_param"]),
            elastic_net_param=float(d["elastic_net_param"]),
            standardize=bool(d["standardize"]),
            deviance=float(d["deviance"]),
            nrow=int(d["nrow"]),
            iter=int(d["iter"]),
            converged=bool(d["converged"]),
            levels={k: list(v) for k, v in d.get("levels", {}).items()},
            call=d.get("call", ""),
        )
    if d["kind"] == "enet":
        return ElasticNetLM(
            xnames=list(d["xnames"]),
            yname=d["yname"],
            coefs=np.asarray(d["coefs"], dtype=np.float64),
            reg_param=float(d["reg_param"]),
            elastic_net_param=float(d["elastic_net_param"]),
            standardize=bool(d["standardize"]),
            nrow=int(d["nrow"]),
            sse=float(d["sse"]),
            sweeps=int(d["sweeps"]),
            converged=bool(d["converged"]),
            levels={k: list(v) for k, v in d.get("levels", {}).items()},
            call=d.get("call", ""),
        )
    if d["kind"] == "quantile":
        return QuantileLM(
            xnames=list(d["xnames"]),
            yname=d["yname"],
            coefs=np.asarray(d["coefs"], dtype=np.float64),
            q=float(d["q"]),
            iter=int(d["iter"]),
            nrow=int(d["nrow"]),
            converged=bool(d["converged"]),
            levels={k: list(v) for k, v in d.get("levels", {}).items()},
            call=d.get("call", ""),
        )
    if d["kind"] == "huber":
        return HuberLM(
            xnames=list(d["xnames"]),
            yname=d["yname"],
            coefs=np.asarray(d["coefs"], dtype=np.float64),
            scale=float(d["scale"]),
            c=float(d["c"]),
            iter=int(d["iter"]),
            nrow=int(d["nrow"]),
            converged=bool(d["converged"]),
            levels={k: list(v) for k, v in d.get("levels", {}).items()},
            call=d.get("call", ""),
        )
    if d["kind"] == "weibull_aft":
        cov = d.get("cov_params")
        return WeibullAFT(
            xnames=list(d["xnames"]),
            time_col=d["time_col"],
            event_col=d["event_col"],
            coefs=np.asarray(d["coefs"], dtype=np.float64),
            scale=float(d["scale"]),
            se=np.asarray(d["se"], dtype=np.float64),
            loglik=float(d["loglik"]),
            n=int(d["n"]),
            n_events=int(d["n_events"]),
            iter=int(d["iter"]),
            converged=bool(d["converged"]),
            cov_params=None if cov is None else np.asarray(cov, dtype=np.float64),
            weight_col=d.get("weight_col"),
            strata_col=d.get("strata_col"),
            scales=None
            if d.get("scales") is None
            else {k: float(v) for k, v in d["scales"]},
            dist=d.get("dist", "weibull"),
        )
    if d["kind"] == "coxph":
        cov = d.get("cov_params")
        return CoxPH(
            xnames=list(d["xnames"]),
            time_col=d["time_col"],
            event_col=d["event_col"],
            coefs=np.asarray(d["coefs"], dtype=np.float64),
            se=np.asarray(d["se"], dtype=np.float64),
            loglik=float(d["loglik"]),
            null_loglik=float(d["null_loglik"]),
            n=int(d["n"]),
            n_events=int(d["n_events"]),
            iter=int(d["iter"]),
            converged=bool(d["converged"]),
            cov_params=None if cov is None else np.asarray(cov, dtype=np.float64),
            time_bucket=d.get("time_bucket"),
            strata_col=d.get("strata_col"),
            weight_col=d.get("weight_col"),
            entry_col=d.get("entry_col"),
        )
    common = dict(
        xnames=list(d["xnames"]),
        yname=d["yname"],
        coefs=np.asarray(d["coefs"], dtype=np.float64),
        std_err=np.asarray(d["std_err"], dtype=np.float64),
        nrow=int(d["nrow"]),
        levels={k: list(v) for k, v in d.get("levels", {}).items()},
        call=d.get("call", ""),
    )
    if d["kind"] == "lm":
        cov = d.get("cov_params")
        return LM(
            sigma=d["sigma"], r2=d["r2"], f_stat=d["f_stat"],
            cov_params=None if cov is None else np.asarray(cov, dtype=np.float64),
            # tolerant read: files written before the flavor flags existed
            # fall back to the call-string prefix (`lm()` stamps "wls("/
            # "ridge(" there), so an old WLS/ridge file still refuses the
            # OLS-only downstream paths
            weighted=bool(
                d.get("weighted", d.get("call", "").startswith("wls("))
            ),
            l2_penalty=float(
                d.get(
                    "l2_penalty",
                    1.0 if d.get("call", "").startswith("ridge(") else 0.0,
                )
            ),
            **common,
        )
    if d["kind"] == "glm":
        cov = d.get("cov_params")
        m = GLM(
            cov_params=None if cov is None else np.asarray(cov, dtype=np.float64),
            family=d["family"],
            link=d["link"],
            deviance=d["deviance"],
            null_deviance=d["null_deviance"],
            df_residual=d["df_residual"],
            df_null=d["df_null"],
            p_dispersion=d["p_dispersion"],
            pearson=d["pearson"],
            loglik=d["loglik"],
            aic=d["aic"],
            iter=int(d["iter"]),
            **common,
        )
        # glm_nb extras (r14) — present only for θ-estimated fits
        for extra in ("theta", "se_theta", "nb_alpha", "outer_iter"):
            if extra in d:
                setattr(m, extra, d[extra])
        return m
    raise ValueError(f"unknown model kind {d['kind']!r}")


def save_model(model: LM | GLM | HuberLM | QuantileLM | CoxPH, path: str) -> None:
    with open(path, "w") as f:
        json.dump(model_to_dict(model), f, indent=1)


def load_model(path: str) -> LM | GLM | HuberLM | QuantileLM | CoxPH:
    with open(path) as f:
        return model_from_dict(json.load(f))
