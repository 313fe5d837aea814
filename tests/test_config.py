"""Tests for the Lua parameter-file interpreter and schema."""

import math

import pytest

from fastpm_tpu.config.minilua import run, LuaError, LuaTable, lua_to_py
from fastpm_tpu.config.params import (load_params, load_params_from_string,
                                      SchemaError)

REF = "/root/reference/tests"
# Tests below that read the reference's own Lua param files validate the
# mini-Lua interpreter against real upstream inputs; they skip when the
# reference tree is absent (everything else runs from vendored fixtures).
needs_reference = pytest.mark.skipif(
    not __import__("os").path.isdir(REF),
    reason="reference tree not available")


def test_lua_basics():
    g = run("""
a = 1 + 2 * 3
s = "x" .. 1 .. "y"
t = {10, 20, key = "v", [5] = 50}
n = #t
b = (a == 7) and not false
local hidden = 3
z = -2^2
""")
    assert g["a"] == 7
    assert g["s"] == "x1y"
    assert lua_to_py(g["t"]) == {1: 10.0, 2: 20.0, "key": "v", 5: 50.0}
    assert g["n"] == 2.0
    assert g["b"] is True
    assert "hidden" not in g
    assert g["z"] == -4.0  # ^ binds tighter than unary minus


def test_lua_control_flow():
    g = run("""
total = 0
for i = 1, 10 do total = total + i end
evens = {}
for i = 2, 10, 2 do evens[#evens + 1] = i end
x = 0
while x < 5 do x = x + 1 end
if x == 5 then r = "five" elseif x == 4 then r = "four" else r = "?" end
""")
    assert g["total"] == 55.0
    assert lua_to_py(g["evens"]) == [2.0, 4.0, 6.0, 8.0, 10.0]
    assert g["r"] == "five"


def test_lua_functions_and_closures():
    g = run("""
function add(a, b) return a + b end
local function mul(a, b) return a * b end
counter = (function()
    local n = 0
    return function() n = n + 1 return n end
end)()
c1 = counter()
c2 = counter()
r = add(2, mul(3, 4))
""")
    assert g["r"] == 14.0
    assert g["c1"] == 1.0 and g["c2"] == 2.0


def test_lua_pairs_and_string_lib():
    g = run("""
t = {"a", "b", "c"}
joined = ""
for i, v in pairs(t) do joined = joined .. v end
up = string.upper("abc")
f = string.format("%d %.2f %s", 3, 1.5, "x")
""")
    assert g["joined"] == "abc"
    assert g["up"] == "ABC"
    assert g["f"] == "3 1.50 x"


def test_lua_error():
    with pytest.raises(LuaError, match="boom"):
        run("error('boom')")


def test_linspace_semantics():
    """linspace includes the endpoint (lua-runtime-fastpm.lua:371-395)."""
    p = load_params_from_string("""
nc = 8
boxsize = 16.0
time_step = linspace(0.1, 1, 5)
Omega_m = 0.3
h = 0.7
pm_nc_factor = 1
np_alloc_factor = 2.0
random_seed = 1
read_powerspectrum = '/root/repo/tests/fixtures/powerspec.txt'
""")
    assert p.time_step == pytest.approx([0.1, 0.325, 0.55, 0.775, 1.0])


@needs_reference
def test_all_reference_configs_load():
    for name, args in [
        ("lightcone.lua", []),
        ("nbodykit.lua", []),
        ("nbodykit-wCDM.lua", []),
        ("nbodykit-ODE.lua", []),
        ("restart.lua", []),
        ("rfof.lua", []),
        ("pminv.lua", []),
        ("lightcone-healpix.lua", []),
        ("lightcone-ODE.lua", []),
        ("lightcone-rfof.lua", []),
        ("valgrind.lua", []),
        ("ncdm.lua", []),
        ("ncdm_linearresponse.lua", []),
    ]:
        p = load_params(f"{REF}/{name}", args)
        assert p.nc > 0 and p.boxsize > 0

    for arg in ("za", "2lpt", "cola", "pm", "zola", "fastpm", "ic"):
        p = load_params(f"{REF}/standard.lua", [arg])
        assert p.nc == 128


@needs_reference
def test_standard_lua_argument_branches():
    p = load_params(f"{REF}/standard.lua", ["za"])
    assert p.za is True and p.force_mode == "pm" and p.time_step == [1.0]
    p = load_params(f"{REF}/standard.lua", ["fastpm", "lanczos3"])
    assert p.painter_type == "lanczos" and p.painter_support == 6
    p = load_params(f"{REF}/standard.lua", ["fastpm", "fixed_mode"])
    assert lua_to_py_modes(p.set_mode) == [[0, 1, 0, 0, 0.1], [0, 1, 0, 1, 0.0]]
    p = load_params(f"{REF}/standard.lua", ["fastpm", "gadget"])
    assert p.kernel_type == "gadget"


def lua_to_py_modes(modes):
    return [[float(x) for x in m] for m in modes]


@needs_reference
def test_wcdm_cosmology_params():
    p = load_params(f"{REF}/nbodykit-wCDM.lua", [])
    assert p.w0 != -1.0 or p.wa != 0.0


def test_schema_rejects_bad_input():
    base = """
nc = 8
boxsize = 16.0
time_step = {0.5, 1.0}
Omega_m = 0.3
h = 0.7
pm_nc_factor = 1
np_alloc_factor = 2.0
"""
    with pytest.raises(SchemaError, match="omega_m is depreciated"):
        load_params_from_string(base + "omega_m = 0.3")
    with pytest.raises(SchemaError, match="growth_mode"):
        load_params_from_string(base + "T_cmb = 2.7\ngrowth_mode='LCDM'")
    with pytest.raises(SchemaError):
        load_params_from_string(base + "force_mode = 'bogus'")
    with pytest.raises(SchemaError, match="required"):
        load_params_from_string("nc = 8")


def test_aout_from_output_redshifts():
    p = load_params_from_string("""
nc = 8
boxsize = 16.0
time_step = {1.0}
output_redshifts = {9.0, 1.0, 0.0}
Omega_m = 0.3
h = 0.7
pm_nc_factor = 1
np_alloc_factor = 2.0
""")
    assert p.aout == pytest.approx([0.1, 0.5, 1.0])


def test_runmain_executes_main():
    """fastpm-lua runs the file's `main` before binding
    (src/fastpm-lua.c, lua-runtime-config.lua:706-716)."""
    src = """
nc = 8
boxsize = 32.0
time_step = {1.0}
output_redshifts = {0.0}
Omega_m = 0.3
h = 0.7
pm_nc_factor = 1
force_mode = "fastpm"
np_alloc_factor = 1.5
read_powerspectrum = "/root/repo/tests/fixtures/powerspec.txt"
random_seed = 1
function main()
    nc = 16
end
"""
    p = load_params_from_string(src)
    assert p.nc == 8          # main pruned, not run
    p = load_params_from_string(src, runmain=True)
    assert p.nc == 16         # main executed


@needs_reference
def test_main_lua_tool(capsys):
    from fastpm_tpu.cli import main_lua
    main_lua(["-H"])
    out = capsys.readouterr().out
    assert "Supported Parameters are" in out and "boxsize" in out
    main_lua(["/root/reference/tests/standard.lua", "za"])
    out = capsys.readouterr().out
    assert "Compiled parameters are" in out
    assert "force_mode = 'pm'" in out and "za = True" in out
