"""Unit tests for SE(3) math."""
import jax.numpy as jnp
import numpy as np

from probabilistic_point_clouds_registration_tpu.core import se3


def _rot_z(angle):
    c, s = np.cos(angle), np.sin(angle)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def test_quat_rotate_matches_matrix():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal(4))
    pts = jnp.asarray(rng.standard_normal((17, 3)))
    rotated = se3.quat_rotate(q, pts)
    R = np.asarray(se3.quat_to_matrix(q))
    np.testing.assert_allclose(np.asarray(rotated), np.asarray(pts) @ R.T, atol=1e-12)


def test_quat_rotate_scale_invariant():
    # The reference's rotation operator normalizes the raw quaternion
    # (error_term.hpp:31 semantics): scaling q must not change the rotation.
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal(4))
    pts = jnp.asarray(rng.standard_normal((5, 3)))
    a = se3.quat_rotate(q, pts)
    b = se3.quat_rotate(3.7 * q, pts)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)


def test_euler_zyx_to_quat_matches_reference_convention():
    # utilities.hpp:252-263: q = yawAngle * pitchAngle * rollAngle.
    roll, pitch, yaw = 0.3, -0.2, 1.1
    q = se3.euler_zyx_to_quat(roll, pitch, yaw)
    R = np.asarray(se3.quat_to_matrix(q))

    def rx(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])

    def ry(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])

    expected = _rot_z(yaw) @ ry(pitch) @ rx(roll)
    np.testing.assert_allclose(R, expected, atol=1e-12)


def test_matrix_quat_roundtrip():
    rng = np.random.default_rng(3)
    for _ in range(20):
        q = rng.standard_normal(4)
        q /= np.linalg.norm(q)
        m = np.asarray(se3.quat_to_matrix(jnp.asarray(q)))
        q2 = np.asarray(se3.matrix_to_quat(m))
        # Quaternion double cover: compare rotations.
        m2 = np.asarray(se3.quat_to_matrix(jnp.asarray(q2)))
        np.testing.assert_allclose(m2, m, atol=1e-12)


def test_se3_compose_and_inverse():
    rng = np.random.default_rng(4)
    qa = jnp.asarray(rng.standard_normal(4))
    qb = jnp.asarray(rng.standard_normal(4))
    a = se3.SE3(q=qa, t=jnp.asarray(rng.standard_normal(3)))
    b = se3.SE3(q=qb, t=jnp.asarray(rng.standard_normal(3)))
    pts = jnp.asarray(rng.standard_normal((9, 3)))
    ab = se3.se3_compose(a, b)
    np.testing.assert_allclose(
        np.asarray(se3.se3_apply(ab, pts)),
        np.asarray(se3.se3_apply(a, se3.se3_apply(b, pts))),
        atol=1e-12,
    )
    ident = se3.se3_compose(a, se3.se3_inverse(a))
    np.testing.assert_allclose(np.asarray(se3.se3_apply(ident, pts)), np.asarray(pts), atol=1e-12)


def test_se3_matrix_roundtrip():
    rng = np.random.default_rng(5)
    tf = se3.SE3(q=jnp.asarray(rng.standard_normal(4)), t=jnp.asarray(rng.standard_normal(3)))
    m = se3.se3_to_matrix(tf)
    tf2 = se3.se3_from_matrix(m)
    pts = jnp.asarray(rng.standard_normal((6, 3)))
    np.testing.assert_allclose(
        np.asarray(se3.se3_apply(tf2, pts)), np.asarray(se3.se3_apply(tf, pts)), atol=1e-12
    )


def test_matrix_euler_xyz_reconstructs_rotation():
    # The report's roll/pitch/yaw columns use Eigen's eulerAngles(0,1,2)
    # convention: R = Rx(a0) Ry(a1) Rz(a2) with a0 in [0, pi].
    rng = np.random.default_rng(6)
    for _ in range(25):
        q = rng.standard_normal(4)
        R = np.asarray(se3.quat_to_matrix(jnp.asarray(q)))
        a0, a1, a2 = se3.matrix_euler_xyz(R)
        assert 0.0 <= a0 <= np.pi + 1e-12

        def rx(a):
            c, s = np.cos(a), np.sin(a)
            return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])

        def ry(a):
            c, s = np.cos(a), np.sin(a)
            return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])

        np.testing.assert_allclose(rx(a0) @ ry(a1) @ _rot_z(a2), R, atol=1e-9)


def test_numpy_twins_match_jax():
    """np_matrix_to_quat / np_quat_to_matrix must agree with the jnp versions
    (the outer loop uses the numpy twins to avoid device roundtrips)."""
    import numpy as np
    from probabilistic_point_clouds_registration_tpu.core import se3

    rng = np.random.default_rng(3)
    for _ in range(20):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        m_np = se3.np_quat_to_matrix(q)
        m_jax = np.asarray(se3.quat_to_matrix(jnp.asarray(q)))
        np.testing.assert_allclose(m_np, m_jax, atol=1e-12)
        q_rt = se3.np_matrix_to_quat(m_np)
        q_jax = np.asarray(se3.matrix_to_quat(jnp.asarray(m_np)))
        np.testing.assert_allclose(q_rt, q_jax, atol=1e-10)
        qq = q if q[0] >= 0 else -q
        np.testing.assert_allclose(q_rt, qq, atol=1e-10)
        t = rng.normal(size=3)
        m4 = se3.np_se3_matrix(q, t)
        assert m4.shape == (4, 4) and np.allclose(m4[:3, 3], t)
