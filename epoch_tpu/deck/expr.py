"""EPOCH input-deck expression language.

Re-implements the reference parser stack — tokenizer
(``epoch2d/src/parser/tokenizer_blocks.f90``), shunting-yard infix→RPN
(``parser/shunt.F90:371``) and the RPN evaluation machine
(``parser/evaluate.F90``, ``parser/evaluator_blocks.F90``) — as a compact
Python front-end whose output is *jittable*: an RPN program is compiled once
and then evaluated as pure array arithmetic, so the same program runs under
``numpy`` (host-side setup) or ``jax.numpy`` (inside ``jit`` for time-varying
laser profiles, moving-window refills, injectors …).

The grammar, function vocabulary, operator precedences and semantics follow
the reference; the implementation is new and array-based.
"""
from __future__ import annotations

import math
import re
from dataclasses import dataclass, field
from typing import Any, Callable

from .. import constants as const

# ---------------------------------------------------------------------------
# tokens
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<num>\d+\.?\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?)
  | (?P<name>[A-Za-z_][A-Za-z0-9_\.]*)
  | (?P<op>[-+*/^(),])
    """,
    re.VERBOSE,
)

# binary word-operators (lt/gt/eq/and/or and the standalone exponent 'e')
_WORD_OPS = {"lt", "gt", "eq", "and", "or", "e"}

# operator → (precedence, right_associative).  Matches the reference table
# (constants.F90:320-325): and/or 0, comparisons 1, +/- 2, */÷ 3,
# ^/e/unary± 4 (right associative) — so -2^2 = -(2^2).
_PREC = {
    "or": (0, False),
    "and": (0, False),
    "lt": (1, False),
    "gt": (1, False),
    "eq": (1, False),
    "+": (2, False),
    "-": (2, False),
    "*": (3, False),
    "/": (3, False),
    "^": (4, True),
    "e": (4, True),
    "neg": (4, True),
}

# functions → number of args (-1 = variadic, resolved at ')')
FUNCTIONS = {
    "abs": 1, "floor": 1, "ceil": 1, "nint": 1, "sqrt": 1,
    "sin": 1, "cos": 1, "tan": 1, "asin": 1, "acos": 1, "atan": 1,
    "atan2": 2, "sinh": 1, "cosh": 1, "tanh": 1, "exp": 1,
    "loge": 1, "ln": 1, "log10": 1, "log_base": 2,
    "gauss": 3, "semigauss": 4, "supergauss": 4,
    "interpolate": -1, "if": 3, "critical": 1,
    # species-parameterised grid functions: density(species) etc.
    "density": 1, "rho": 1, "number_density": 1,
    "temp_x": 1, "temp_y": 1, "temp_z": 1,
    "temp_x_k": 1, "temp_y_k": 1, "temp_z_k": 1,
    "temperature_x": 1, "temperature_y": 1, "temperature_z": 1,
    "temp_x_ev": 1, "temp_y_ev": 1, "temp_z_ev": 1,
    "ex": 1, "ey": 1, "ez": 1, "bx": 1, "by": 1, "bz": 1,
}

# grid/field gather functions take an index argument in the reference
# (ex(ix) etc.); we treat bare names below instead.

_CONSTANTS = {
    "pi": const.pi,
    "kb": const.kb,
    "me": const.m0,
    "qe": const.q0,
    "c": const.c,
    "eps0": const.epsilon0,
    "epsilon0": const.epsilon0,
    "epsilonnought": const.epsilon0,
    "mu0": const.mu0,
    "munought": const.mu0,
    "ev": const.ev,
    "kev": const.ev * 1e3,
    "mev": const.ev * 1e6,
    "milli": 1e-3,
    "micro": 1e-6,
    "micron": 1e-6,
    "cm3": 1e-6,
    "cc": 1e-6,
    "nano": 1e-9,
    "pico": 1e-12,
    "femto": 1e-15,
    "atto": 1e-18,
    # solver names usable as values (maxwell_solver = lehe_x …)
    "yee": float(const.MaxwellSolver.YEE),
    "cowan": float(const.MaxwellSolver.COWAN),
    "pukhov": float(const.MaxwellSolver.PUKHOV),
    "lehe": float(const.MaxwellSolver.LEHE),
    "lehe_x": float(const.MaxwellSolver.LEHE_X),
    "lehe_y": float(const.MaxwellSolver.LEHE_Y),
    "lehe_z": float(const.MaxwellSolver.LEHE_Z),
    "custom": float(const.MaxwellSolver.CUSTOM),
    # dist_fn directions
    "dir_x": float(const.Direction.X),
    "dir_y": float(const.Direction.Y),
    "dir_z": float(const.Direction.Z),
    "dir_px": float(const.Direction.PX),
    "dir_py": float(const.Direction.PY),
    "dir_pz": float(const.Direction.PZ),
    "dir_en": float(const.Direction.EN),
    "dir_energy": float(const.Direction.EN),
    "dir_gamma_m1": float(const.Direction.GAMMA_M1),
    "dir_gamma_minus_one": float(const.Direction.GAMMA_M1),
    "dir_xy_angle": float(const.Direction.XY_ANGLE),
    "dir_yz_angle": float(const.Direction.YZ_ANGLE),
    "dir_zx_angle": float(const.Direction.ZX_ANGLE),
    "dir_mod_p": float(const.Direction.MOD_P),
}

# dumpmask words (tokenizer_blocks.f90:221-253)
DUMPMASK_WORDS = {
    "never": const.IOType.NEVER,
    "always": const.IOType.ALWAYS,
    "full": const.IOType.FULL,
    "restartable": const.IOType.RESTART,
    "restart": const.IOType.RESTART,
    "average": const.IOType.AVERAGE,
    "snapshot": const.IOType.SNAPSHOT,
    "species": const.IOType.SPECIES,
    "no_sum": const.IOType.NO_SUM,
    "single": const.IOType.SINGLE,
    "average_single": const.IOType.AVERAGE_SINGLE,
}

# deck variables resolved from the evaluation context at run time.
# Grid/time variables (tokenizer_blocks.f90:177-217 + 2d/3d deltas).
CONTEXT_VARS = {
    "x", "y", "z", "xb", "yb", "zb", "ix", "iy", "iz", "time",
    "nx", "ny", "nz", "dx", "dy", "dz",
    "x_min", "x_max", "y_min", "y_max", "z_min", "z_max",
    "x_start", "x_end", "y_start", "y_end", "z_start", "z_end",
    "lengthx", "length_x", "lengthy", "length_y", "lengthz", "length_z",
    "nprocx", "nprocy", "nprocz", "nproc_x", "nproc_y", "nproc_z",
    "nsteps", "t_end", "ndims",
    "r_xy", "r_yz", "r_xz", "r_xyz",
    # particle-position pack variables (used by subset restrictions, manual
    # momentum expressions): px/py/pz handled here too.
    "px", "py", "pz",
}


@dataclass(frozen=True)
class Op:
    """One RPN element."""
    kind: str       # 'num' | 'var' | 'op' | 'func'
    val: Any = None
    nargs: int = 0


Token = tuple  # (kind, text)


def tokenize(text: str) -> list[Token]:
    toks: list[Token] = []
    pos = 0
    text = text.strip()
    while pos < len(text):
        if text[pos].isspace():
            pos += 1
            continue
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise DeckExprError(f"cannot tokenize {text[pos:]!r} in {text!r}")
        pos = m.end()
        if m.lastgroup == "num":
            toks.append(("num", m.group()))
        elif m.lastgroup == "name":
            name = m.group()
            if name.lower() in _WORD_OPS:
                toks.append(("op", name.lower()))
            else:
                toks.append(("name", name))
        else:
            toks.append(("op", m.group()))
    return toks


class DeckExprError(ValueError):
    pass


class _Name:
    """Sentinel carrying a bare identifier (species-name argument)."""
    __slots__ = ("name",)

    def __init__(self, name):
        self.name = name

    def __repr__(self):
        return f"_Name({self.name})"


def parse_to_rpn(
    text: str,
    user_constants: dict[str, list[Op]] | None = None,
    species_names: tuple[str, ...] = (),
) -> list[Op]:
    """Shunting-yard infix → RPN (reference: parser/shunt.F90:371-505).

    ``user_constants`` are ``begin:constant`` entries: their RPN is inlined
    at the point of use (the reference stores a stack per constant and
    expands on evaluation; inlining is equivalent and keeps programs flat).
    """
    user_constants = user_constants or {}
    toks = tokenize(text)
    out: list[Op] = []
    stack: list[tuple] = []   # ('op', name) | ('func', name) | ('paren',) | ('argc', n)
    argc_stack: list[int] = []
    prev_kind = "start"  # start | value | op | lparen | comma

    def pop_op(name):
        out.append(Op("op", name))

    i = 0
    while i < len(toks):
        kind, tok = toks[i]
        if kind == "num":
            out.append(Op("num", float(tok)))
            prev_kind = "value"
        elif kind == "name":
            nxt = toks[i + 1] if i + 1 < len(toks) else None
            low = tok.lower()
            from ..extensions import EXPR_CONSTANTS, EXPR_FUNCTIONS
            if (low in FUNCTIONS or low in EXPR_FUNCTIONS) \
                    and nxt == ("op", "("):
                stack.append(("func", low))
                prev_kind = "op"
            elif tok in user_constants:
                out.extend(user_constants[tok])
                prev_kind = "value"
            elif low in _CONSTANTS:
                out.append(Op("num", _CONSTANTS[low]))
                prev_kind = "value"
            elif low in EXPR_CONSTANTS:
                # user-registered constants (custom_parser.f90
                # custom_constant analogue)
                out.append(Op("num", EXPR_CONSTANTS[low]))
                prev_kind = "value"
            elif low in CONTEXT_VARS:
                out.append(Op("var", low))
                prev_kind = "value"
            else:
                # species names, dumpmask words, and late-bound names all
                # resolve from the evaluation context (or as _Name sentinels
                # for species-function arguments).
                out.append(Op("var", tok))
                prev_kind = "value"
        elif kind == "op" and tok == "(":
            stack.append(("paren",))
            prev_kind = "lparen"
        elif kind == "op" and tok == ")":
            while stack and stack[-1][0] == "op":
                pop_op(stack.pop()[1])
            if not stack:
                raise DeckExprError(f"mismatched ')' in {text!r}")
            stack.pop()  # paren
            if stack and stack[-1][0] == "func":
                fname = stack.pop()[1]
                if fname not in FUNCTIONS:
                    from ..extensions import EXPR_FUNCTIONS
                    nargs = EXPR_FUNCTIONS[fname][1]
                else:
                    # variadic arg counts are patched by parse(); -1 marks
                    nargs = -1 if fname_uses_argc(fname) \
                        else FUNCTIONS[fname]
                out.append(Op("func", fname, nargs=nargs))
            prev_kind = "value"
        elif kind == "op" and tok == ",":
            while stack and stack[-1][0] == "op":
                pop_op(stack.pop()[1])
            if argc_stack:
                argc_stack[-1] += 1
            prev_kind = "comma"
        elif kind == "op":
            name = tok
            if name == "-" and prev_kind in ("start", "op", "lparen", "comma"):
                name = "neg"
            elif name == "+" and prev_kind in ("start", "op", "lparen", "comma"):
                i += 1
                continue  # unary plus is a no-op
            prec, right = _PREC[name]
            while stack and stack[-1][0] == "op":
                tprec, _ = _PREC[stack[-1][1]]
                if tprec > prec or (tprec == prec and not right):
                    pop_op(stack.pop()[1])
                else:
                    break
            stack.append(("op", name))
            prev_kind = "op"
        i += 1

    # track argc: when a function with variadic args opens, start counting
    # (we patch this by a simple two-pass approach below)
    while stack:
        top = stack.pop()
        if top[0] != "op":
            raise DeckExprError(f"mismatched '(' in {text!r}")
        pop_op(top[1])
    return out


def fname_uses_argc(fname: str) -> bool:
    return FUNCTIONS.get(fname, 0) == -1


# variadic functions need arg counting; redo parse with explicit counting for
# interpolate. Simplest: count top-level commas inside its parens at tokenize
# level. We hook it via a pre-pass that rewrites nothing but records counts.
def _count_args(toks: list[Token], open_idx: int) -> int:
    depth = 0
    count = 1
    for kind, tok in toks[open_idx:]:
        if kind == "op" and tok == "(":
            depth += 1
        elif kind == "op" and tok == ")":
            depth -= 1
            if depth == 0:
                return count
        elif kind == "op" and tok == "," and depth == 1:
            count += 1
    raise DeckExprError("unterminated function call")


def parse(text, user_constants=None, species_names=()):
    """Parse with variadic-arg resolution."""
    toks = tokenize(text)
    # pre-compute arg counts for variadic calls in textual order
    variadic_counts = []
    for idx, (kind, tok) in enumerate(toks):
        if kind == "name" and fname_uses_argc(tok.lower()):
            variadic_counts.append(_count_args(toks, idx + 1))
    rpn = parse_to_rpn(text, user_constants, species_names)
    vi = 0
    fixed = []
    for op in rpn:
        if op.kind == "func" and fname_uses_argc(op.val):
            fixed.append(Op("func", op.val, nargs=variadic_counts[vi]))
            vi += 1
        else:
            fixed.append(op)
    return fixed


def is_time_varying(rpn: list[Op]) -> bool:
    return any(op.kind == "var" and op.val == "time" for op in rpn)


def uses_vars(rpn: list[Op], names: set[str]) -> bool:
    return any(op.kind == "var" and op.val in names for op in rpn)


# ---------------------------------------------------------------------------
# evaluation
# ---------------------------------------------------------------------------

_SPECIES_FUNCS = {
    "density", "rho", "number_density",
    "temp_x", "temp_y", "temp_z",
    "temp_x_k", "temp_y_k", "temp_z_k",
    "temperature_x", "temperature_y", "temperature_z",
    "temp_x_ev", "temp_y_ev", "temp_z_ev",
    "ex", "ey", "ez", "bx", "by", "bz",
}


def evaluate(rpn: list[Op], ctx: dict[str, Any], xp=None):
    """Evaluate an RPN program.

    ``ctx`` maps variable names → scalars or arrays (broadcastable).  ``xp``
    is the array namespace (numpy by default, jax.numpy inside jit).
    Semantics follow parser/evaluator_blocks.F90 (gauss :964, semigauss
    :970, supergauss :983, critical :990, if :845, interpolate :856,
    'e' operator = a*10^b :100).
    """
    if xp is None:
        import numpy as xp  # noqa: F401
    st: list[Any] = []

    def pop(n):
        vals = st[len(st) - n:]
        del st[len(st) - n:]
        return vals

    for op in rpn:
        if op.kind == "num":
            st.append(op.val)
        elif op.kind == "var":
            if op.val in ctx:
                st.append(ctx[op.val])
            else:
                # species names appear as bare arguments of density()/temp_x()
                # etc.; push the literal name for the function to consume.
                st.append(_Name(op.val))
        elif op.kind == "op":
            if op.val == "neg":
                st.append(-st.pop())
                continue
            b = st.pop()
            a = st.pop()
            if op.val == "+":
                st.append(a + b)
            elif op.val == "-":
                st.append(a - b)
            elif op.val == "*":
                st.append(a * b)
            elif op.val == "/":
                st.append(a / b)
            elif op.val == "^":
                st.append(_power(a, b, xp))
            elif op.val == "e":
                st.append(a * 10.0 ** b)
            elif op.val == "lt":
                st.append(_bool(a < b, xp))
            elif op.val == "gt":
                st.append(_bool(a > b, xp))
            elif op.val == "eq":
                st.append(_bool(a == b, xp))
            elif op.val == "and":
                st.append(_bool(_truthy(a, xp) & _truthy(b, xp), xp))
            elif op.val == "or":
                st.append(_bool(_truthy(a, xp) | _truthy(b, xp), xp))
            else:
                raise DeckExprError(f"bad op {op.val}")
        else:  # func
            f = op.val
            from ..extensions import EXPR_FUNCTIONS
            if f in EXPR_FUNCTIONS and f not in FUNCTIONS:
                # user-registered function (custom_parser.f90
                # custom_function analogue)
                fn, nargs = EXPR_FUNCTIONS[f]
                st.append(fn(*pop(nargs)))
                continue
            if f in _SPECIES_FUNCS:
                # argument is a species "variable" pushed as a name string
                arg = pop(op.nargs)[0]
                name = arg.name if isinstance(arg, _Name) else str(arg)
                key = f"{_canon_species_func(f)}:{name}"
                try:
                    st.append(ctx[key])
                except KeyError:
                    raise DeckExprError(f"species function {key!r} not available")
                continue
            a = pop(op.nargs)
            if f == "abs":
                st.append(xp.abs(a[0]))
            elif f == "floor":
                st.append(xp.floor(a[0]))
            elif f == "ceil":
                st.append(xp.ceil(a[0]))
            elif f == "nint":
                st.append(xp.round(a[0]))
            elif f == "sqrt":
                st.append(xp.sqrt(a[0]))
            elif f in ("sin", "cos", "tan", "sinh", "cosh", "tanh", "exp"):
                st.append(getattr(xp, f)(a[0]))
            elif f == "asin":
                st.append(xp.arcsin(a[0]))
            elif f == "acos":
                st.append(xp.arccos(a[0]))
            elif f == "atan":
                st.append(xp.arctan(a[0]))
            elif f == "atan2":
                st.append(xp.arctan2(a[0], a[1]))
            elif f in ("loge", "ln"):
                st.append(xp.log(a[0]))
            elif f == "log10":
                st.append(xp.log10(a[0]))
            elif f == "log_base":
                st.append(xp.log(a[0]) / xp.log(a[1]))
            elif f == "gauss":
                x, x0, w = a
                st.append(xp.exp(-(((x - x0) / w) ** 2)))
            elif f == "semigauss":
                t, amp, amp0, w = a
                t0 = w * math.sqrt(-math.log(amp0 / amp)) if _is_scalar(amp0, amp) \
                    else w * xp.sqrt(-xp.log(amp0 / amp))
                st.append(xp.where(t <= t0, amp * xp.exp(-(((t - t0) / w) ** 2)), amp))
            elif f == "supergauss":
                x, x0, w, n = a
                st.append(xp.exp(-xp.abs((x - x0) / w) ** n))
            elif f == "critical":
                om = a[0]
                st.append(om ** 2 * const.m0 * const.epsilon0 / const.q0 ** 2)
            elif f == "if":
                cond, t, fv = a
                st.append(xp.where(xp.floor(cond) != 0, t, fv))
            elif f == "interpolate":
                # interpolate(n, x1, y1, ..., xn, yn, pos)
                n = int(a[0])
                xs = [a[1 + 2 * i] for i in range(n)]
                ys = [a[2 + 2 * i] for i in range(n)]
                point = a[-1]
                st.append(_piecewise_linear(point, xs, ys, xp))
            else:
                raise DeckExprError(f"unimplemented function {f!r}")
    if len(st) != 1:
        raise DeckExprError(f"expression left {len(st)} values on stack")
    return st[0]


def _canon_species_func(f: str) -> str:
    if f in ("density", "rho", "number_density"):
        return "density"
    if f.startswith("temperature"):
        f = f.replace("temperature", "temp")
    if f.endswith("_k"):
        f = f[:-2]
    return f


def _power(a, b, xp):
    if _is_scalar(a, b):
        return a ** b
    return xp.power(a, b)


def _bool(v, xp):
    if isinstance(v, bool):
        return 1.0 if v else 0.0
    return xp.where(v, 1.0, 0.0)


def _truthy(v, xp):
    if isinstance(v, (bool, float, int)):
        return bool(v) if isinstance(v, bool) else v != 0
    return v != 0


def _is_scalar(*vals) -> bool:
    return all(isinstance(v, (int, float)) for v in vals)


def _piecewise_linear(point, xs, ys, xp):
    if _is_scalar(point, *xs, *ys):
        import numpy as np
        return float(np.interp(point, np.asarray(xs), np.asarray(ys)))
    xs_a = xp.asarray(xs)
    ys_a = xp.asarray(ys)
    return xp.interp(point, xs_a, ys_a)


@dataclass
class Expression:
    """A parsed deck expression: RPN plus convenience evaluators."""
    text: str
    rpn: list[Op] = field(default_factory=list)

    @classmethod
    def compile(cls, text, user_constants=None, species_names=()):
        return cls(text=text, rpn=parse(text, user_constants, species_names))

    @property
    def time_varying(self) -> bool:
        return is_time_varying(self.rpn)

    @property
    def space_varying(self) -> bool:
        return uses_vars(self.rpn, {"x", "y", "z", "xb", "yb", "zb", "ix", "iy", "iz"})

    def __call__(self, ctx=None, xp=None, **kw):
        c = dict(ctx or {})
        c.update(kw)
        return evaluate(self.rpn, c, xp=xp)

    def const(self) -> float:
        """Evaluate as a constant (no context)."""
        return float(evaluate(self.rpn, {}))
