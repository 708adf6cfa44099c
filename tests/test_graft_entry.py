"""CI coverage for the driver entry points (``__graft_entry__.py``).

The round driver compile-checks ``entry()`` single-chip and executes
``dryrun_multichip(N)`` on a virtual N-device CPU mesh (the same setup
tests/conftest.py forces). Nothing else in the suite imports that module, so
a refactor elsewhere in the package could silently break either gate between
rounds — this test keeps both exercised in CI.
"""

import jax
import numpy as np

import __graft_entry__ as ge


class TestEntry:
    def test_entry_compiles_and_runs(self):
        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert out.shape == (1, 200, 256)
        assert np.isfinite(np.asarray(out)).all()


class TestDryrunMultichip:
    def test_dryrun_8_devices(self, capsys):
        ge.dryrun_multichip(8)
        out = capsys.readouterr().out
        # train step + sharded generate + sharded longform
        assert out.count("OK") == 3
