package graft.ml

/** Seeded pure-JVM convolutional AutoEncoder for the E3 slot
  * (reference: app.py:490-641 — Conv2D stride-2 stack → Dense(2)
  * latent → Conv2DTranspose mirror with sigmoid output, Adam + MSE,
  * early stopping on train loss). This is the faithful small-scale
  * regime behind [[Embedding.aeEmbed]]'s gate; the linear substitute
  * ([[Embedding.aeSubstitute]]) remains the scale fallback.
  *
  * Architecture (input S×S×1, S = imgSize, one stride-2 stage per
  * entry of Config.filters — round 13: variable depth):
  * Conv(F_i, 3×3, s2, same, relu)… → flatten → Dense(2) [latent] →
  * Dense(flat, linear) → reshape → ConvT mirror (relu; final stage
  * sigmoid). The default (F1, F2) pair serves the engine's 8×8
  * imaging tier; [[Config.reference64]] is the reference's
  * IMG_SIZE = 64 regime (16→32→64, app.py:563-571). Deviations from
  * the reference, documented in COVERAGE.md: no BatchNorm (a
  * seeded-but-stateful layer whose running statistics would make the
  * embedding depend on batch composition — the determinism contract
  * wins), a symmetric-mirror decoder (the reference's ConvT widths
  * are one step wider by its lenl formula), 256/512 image regimes
  * out of scope, and a bounded seeded fit sample (the CanonicalFit
  * pattern) instead of training on the full corpus.
  *
  * Determinism: ALL state is driver-local — seeded Glorot init in a
  * fixed parameter order, seeded Fisher-Yates batch shuffles, and a
  * sequential Adam loop over images collected in id order — so the
  * embedding is bitwise identical at any session parallelism
  * (local[4] ≡ local[8] ≡ local[32]); the only distributed stages
  * (imaging UDF, final projection) are per-row maps.
  *
  * Geometry: TF "same" padding for stride 2 / kernel 3 on even sizes
  * is pad_beg = 0, pad_end = 1, so an output cell (oy, ox) reads
  * input (2·oy + ky, 2·ox + kx) with out-of-range taps zero. The
  * ConvTranspose layers are implemented exactly as the data-gradient
  * of that convolution (the identity TF itself uses), so forward /
  * backward pairs share one set of three conv primitives.
  */
object ConvAE {

  /** Hyper-parameters. `fitSample`: the fit runs on at most this many
    * seeded-sampled images (embedding still covers every input).
    * `filters` (round 13): explicit conv-stack widths, one stride-2
    * stage per entry; empty keeps the legacy (f1, f2) two-stage
    * engine default, so every existing digest pin is untouched. */
  final case class Config(
      imgSize: Int = 8, f1: Int = 8, f2: Int = 16, latent: Int = 2,
      lr: Double = 3e-3, epochs: Int = 60, batchSize: Int = 32,
      patience: Int = 10, fitSample: Int = 256, seed: Long = 1L,
      filters: Seq[Int] = Nil) {
    /** Resolved conv widths: `filters` when given, else (f1, f2). */
    private[ml] def stack: Array[Int] =
      (if (filters.nonEmpty) filters else Seq(f1, f2)).toArray
  }

  object Config {
    /** The reference's IMG_SIZE = 64 regime (app.py:508-513 flag '1';
      * encoder app.py:563-571: Conv2D(16, 3, s2) then count−4 = 2
      * further stride-2 convs at widths 32, 64 for count = log2(64),
      * landing on an 8×8×64 flatten → Dense(2) latent at
      * app.py:579). The decoder here is the symmetric mirror of the
      * encoder — the reference's ConvT widths follow its own
      * lenl = IMG_SIZE/((count%2)+1) formula (app.py:585-591) and are
      * one step wider; documented deviation (COVERAGE §2), same class
      * as the dropped BatchNorm. */
    def reference64: Config = Config(imgSize = 64, filters = Seq(16, 32, 64))

    /** The reference's IMG_SIZE = 256 regime (app.py:508-513 flag
      * '2'): count = log2(256) = 8, so Conv2D(16, 3, s2) plus
      * count − 4 = 4 further stride-2 convs at the doubling widths
      * 32, 64, 128, 256 (app.py:566-571, lenl *= 2), landing on the
      * same 8×8 spatial flatten (8×8×256) → Dense(2). Round 14: the
      * round-13 variable-depth stack expresses this directly — no new
      * engine code, just the widths. */
    def reference256: Config =
      Config(imgSize = 256, filters = Seq(16, 32, 64, 128, 256))

    /** The reference's IMG_SIZE = 512 regime (flag '3'): count = 9,
      * five extra convs at widths 32..512, flatten 8×8×512 after six
      * stride-2 halvings (512 → 8). Same formula, one deeper. */
    def reference512: Config =
      Config(imgSize = 512, filters = Seq(16, 32, 64, 128, 256, 512))
  }

  /** One tensor's parameters + Adam state. */
  private final class P(val w: Array[Double]) {
    val m = new Array[Double](w.length)
    val v = new Array[Double](w.length)
    val g = new Array[Double](w.length) // accumulated minibatch grad
  }

  /** The full parameter set; declaration order IS the seeded init
    * order (round 13: generalized from the hardwired two-stage pair
    * to `cfg.stack.length` stages — for the default stack the RNG
    * consumption sequence, shapes, and therefore every weight are
    * bit-identical to the old w1/b1/w2/b2/…/t1/tb1/t2/tb2 fields). */
  private final class Net(cfg: Config) {
    /** channels per level; ch(0) = 1 (grayscale input). */
    val ch: Array[Int] = 1 +: cfg.stack
    val depth: Int = ch.length - 1
    /** spatial size per level (stride-2 halving, TF-same ceil). */
    val hs: Array[Int] = {
      val a = new Array[Int](depth + 1)
      a(0) = cfg.imgSize
      var i = 1
      while (i <= depth) { a(i) = (a(i - 1) + 1) / 2; i += 1 }
      a
    }
    val flat: Int = hs(depth) * hs(depth) * ch(depth)
    private val rnd = new java.util.Random(cfg.seed)
    private def glorot(n: Int, fanIn: Int, fanOut: Int): Array[Double] = {
      val lim = math.sqrt(6.0 / (fanIn + fanOut))
      Array.fill(n)((rnd.nextDouble() * 2.0 - 1.0) * lim)
    }
    // conv weights live as w[cOut][cIn][ky][kx] flattened; the ConvT
    // layers store the REVERSE conv's weights (their big→small map)
    val convW = new Array[P](depth)
    val convB = new Array[P](depth)
    locally {
      var i = 0
      while (i < depth) {
        convW(i) = new P(glorot(ch(i + 1) * ch(i) * 9, ch(i) * 9, ch(i + 1) * 9))
        convB(i) = new P(new Array[Double](ch(i + 1)))
        i += 1
      }
    }
    val we = new P(glorot(cfg.latent * flat, flat, cfg.latent))
    val be = new P(new Array[Double](cfg.latent))
    val wd = new P(glorot(flat * cfg.latent, cfg.latent, flat))
    val bd = new P(new Array[Double](flat))
    // decoder stage d reverses encoder stage e = depth-1-d
    val decW = new Array[P](depth)
    val decB = new Array[P](depth)
    locally {
      var d = 0
      while (d < depth) {
        val e = depth - 1 - d
        decW(d) = new P(glorot(ch(e + 1) * ch(e) * 9, ch(e + 1) * 9, ch(e) * 9))
        decB(d) = new P(new Array[Double](ch(e)))
        d += 1
      }
    }
    val all: Array[P] =
      (0 until depth).flatMap(i => Seq(convW(i), convB(i))).toArray ++
        Array(we, be, wd, bd) ++
        (0 until depth).flatMap(d => Seq(decW(d), decB(d))).toArray
  }

  // ---- conv primitives: stride 2, kernel 3, TF-same (pad_beg 0) ----
  // A: (cIn, hIn, hIn) row-major; B: (cOut, hOut, hOut), hOut = ceil(hIn/2)

  private def convFwd(w: Array[Double], cIn: Int, cOut: Int, hIn: Int,
      a: Array[Double], b: Array[Double]): Unit = {
    val hOut = (hIn + 1) / 2
    java.util.Arrays.fill(b, 0.0)
    var co = 0
    while (co < cOut) {
      var ci = 0
      while (ci < cIn) {
        val wBase = (co * cIn + ci) * 9
        val aBase = ci * hIn * hIn
        var oy = 0
        while (oy < hOut) {
          var ox = 0
          while (ox < hOut) {
            var s = 0.0
            var ky = 0
            while (ky < 3) {
              val iy = 2 * oy + ky
              if (iy < hIn) {
                var kx = 0
                while (kx < 3) {
                  val ix = 2 * ox + kx
                  if (ix < hIn) s += w(wBase + ky * 3 + kx) * a(aBase + iy * hIn + ix)
                  kx += 1
                }
              }
              ky += 1
            }
            b((co * hOut + oy) * hOut + ox) += s
            ox += 1
          }
          oy += 1
        }
        ci += 1
      }
      co += 1
    }
  }

  /** dA from dB (also ConvT's forward, with dB playing the small input). */
  private def convBwdData(w: Array[Double], cIn: Int, cOut: Int, hIn: Int,
      dB: Array[Double], dA: Array[Double]): Unit = {
    val hOut = (hIn + 1) / 2
    java.util.Arrays.fill(dA, 0.0)
    var co = 0
    while (co < cOut) {
      var ci = 0
      while (ci < cIn) {
        val wBase = (co * cIn + ci) * 9
        val aBase = ci * hIn * hIn
        var oy = 0
        while (oy < hOut) {
          var ox = 0
          while (ox < hOut) {
            val g = dB((co * hOut + oy) * hOut + ox)
            if (g != 0.0) {
              var ky = 0
              while (ky < 3) {
                val iy = 2 * oy + ky
                if (iy < hIn) {
                  var kx = 0
                  while (kx < 3) {
                    val ix = 2 * ox + kx
                    if (ix < hIn) dA(aBase + iy * hIn + ix) += w(wBase + ky * 3 + kx) * g
                    kx += 1
                  }
                }
                ky += 1
              }
            }
            ox += 1
          }
          oy += 1
        }
        ci += 1
      }
      co += 1
    }
  }

  /** dW accumulation from (A, dB) — adds into dw. */
  private def convBwdW(cIn: Int, cOut: Int, hIn: Int,
      a: Array[Double], dB: Array[Double], dw: Array[Double]): Unit = {
    val hOut = (hIn + 1) / 2
    var co = 0
    while (co < cOut) {
      var ci = 0
      while (ci < cIn) {
        val wBase = (co * cIn + ci) * 9
        val aBase = ci * hIn * hIn
        var oy = 0
        while (oy < hOut) {
          var ox = 0
          while (ox < hOut) {
            val g = dB((co * hOut + oy) * hOut + ox)
            if (g != 0.0) {
              var ky = 0
              while (ky < 3) {
                val iy = 2 * oy + ky
                if (iy < hIn) {
                  var kx = 0
                  while (kx < 3) {
                    val ix = 2 * ox + kx
                    if (ix < hIn) dw(wBase + ky * 3 + kx) += a(aBase + iy * hIn + ix) * g
                    kx += 1
                  }
                }
                ky += 1
              }
            }
            ox += 1
          }
          oy += 1
        }
        ci += 1
      }
      co += 1
    }
  }

  /** Per-image activations workspace (reused across the batch). */
  private final class Ws(net: Net, cfg: Config) {
    /** encoder activations, act(i) at level i+1. */
    val act: Array[Array[Double]] = Array.tabulate(net.depth)(i =>
      new Array[Double](net.ch(i + 1) * net.hs(i + 1) * net.hs(i + 1)))
    val z = new Array[Double](cfg.latent)
    val g = new Array[Double](net.flat)
    /** decoder outputs, dec(d) at level depth-1-d; dec(last) = image. */
    val dec: Array[Array[Double]] = Array.tabulate(net.depth) { d =>
      val e = net.depth - 1 - d
      new Array[Double](net.ch(e) * net.hs(e) * net.hs(e))
    }
    // gradient mirrors
    val dDec: Array[Array[Double]] = Array.tabulate(net.depth) { d =>
      val e = net.depth - 1 - d
      new Array[Double](net.ch(e) * net.hs(e) * net.hs(e))
    }
    val dG = new Array[Double](net.flat)
    val dZ = new Array[Double](cfg.latent)
    val dAct: Array[Array[Double]] = Array.tabulate(net.depth)(i =>
      new Array[Double](net.ch(i + 1) * net.hs(i + 1) * net.hs(i + 1)))
  }

  /** Forward pass; x is the normalized S×S image. Returns MSE. When
    * `latentOnly`, stops after the encoder (embedding path). */
  private def forward(net: Net, cfg: Config, x: Array[Double], ws: Ws,
      latentOnly: Boolean): Double = {
    var prev = x
    var li = 0
    while (li < net.depth) {
      convFwd(net.convW(li).w, net.ch(li), net.ch(li + 1), net.hs(li),
        prev, ws.act(li))
      val a = ws.act(li)
      val hsq = net.hs(li + 1) * net.hs(li + 1)
      var i = 0
      while (i < a.length) {
        val v = a(i) + net.convB(li).w(i / hsq)
        a(i) = if (v > 0) v else 0.0
        i += 1
      }
      prev = a
      li += 1
    }
    var l = 0
    while (l < cfg.latent) {
      var s = net.be.w(l)
      var j = 0
      while (j < net.flat) { s += net.we.w(l * net.flat + j) * prev(j); j += 1 }
      ws.z(l) = s
      l += 1
    }
    if (latentOnly) return 0.0
    var j = 0
    while (j < net.flat) {
      var s = net.bd.w(j)
      var l2 = 0
      while (l2 < cfg.latent) { s += net.wd.w(j * cfg.latent + l2) * ws.z(l2); l2 += 1 }
      ws.g(j) = s
      j += 1
    }
    // ConvT stages: small → big via reverse-conv weights; relu on all
    // but the last (sigmoid, fused with the MSE loop below)
    var src: Array[Double] = ws.g
    var d = 0
    while (d < net.depth) {
      val e = net.depth - 1 - d
      convBwdData(net.decW(d).w, net.ch(e), net.ch(e + 1), net.hs(e),
        src, ws.dec(d))
      if (d < net.depth - 1) {
        val o = ws.dec(d)
        val hsq = net.hs(e) * net.hs(e)
        var i = 0
        while (i < o.length) {
          val v = o(i) + net.decB(d).w(i / hsq)
          o(i) = if (v > 0) v else 0.0
          i += 1
        }
        src = o
      }
      d += 1
    }
    val out = ws.dec(net.depth - 1)
    val obias = net.decB(net.depth - 1).w(0)
    var mse = 0.0
    var i = 0
    while (i < out.length) {
      val v = 1.0 / (1.0 + math.exp(-(out(i) + obias)))
      out(i) = v
      val dd = v - x(i)
      mse += dd * dd
      i += 1
    }
    mse / out.length
  }

  /** Backward pass (call right after a full forward); accumulates
    * parameter grads into net.*.g. */
  private def backward(net: Net, cfg: Config, x: Array[Double], ws: Ws): Unit = {
    val depth = net.depth
    val out = ws.dec(depth - 1)
    val dOut = ws.dDec(depth - 1)
    val nPix = out.length
    var i = 0
    while (i < nPix) {
      val o = out(i)
      dOut(i) = (2.0 / nPix) * (o - x(i)) * o * (1.0 - o)
      net.decB(depth - 1).g(0) += dOut(i)
      i += 1
    }
    // ConvT stages, shallow (image) end first: for a reverse-conv
    // layer, dW = bwdW(A = dY big, dB = its small input) and the
    // input grad is the plain convFwd of dY through its weights
    var d = depth - 1
    while (d >= 0) {
      val e = depth - 1 - d
      val inp = if (d == 0) ws.g else ws.dec(d - 1)
      convBwdW(net.ch(e), net.ch(e + 1), net.hs(e), ws.dDec(d), inp,
        net.decW(d).g)
      val dTgt = if (d == 0) ws.dG else ws.dDec(d - 1)
      convFwd(net.decW(d).w, net.ch(e), net.ch(e + 1), net.hs(e),
        ws.dDec(d), dTgt)
      if (d > 0) {
        val act = ws.dec(d - 1)
        val ePrev = e + 1 // level of dec stage d-1's output
        val hsq = net.hs(ePrev) * net.hs(ePrev)
        var i2 = 0
        while (i2 < dTgt.length) {
          if (act(i2) <= 0.0) dTgt(i2) = 0.0
          net.decB(d - 1).g(i2 / hsq) += dTgt(i2)
          i2 += 1
        }
      }
      d -= 1
    }
    var j = 0
    while (j < net.flat) {
      val dg = ws.dG(j)
      net.bd.g(j) += dg
      var l = 0
      while (l < cfg.latent) {
        net.wd.g(j * cfg.latent + l) += dg * ws.z(l)
        l += 1
      }
      j += 1
    }
    var l = 0
    while (l < cfg.latent) {
      var s = 0.0
      var j2 = 0
      while (j2 < net.flat) { s += net.wd.w(j2 * cfg.latent + l) * ws.dG(j2); j2 += 1 }
      ws.dZ(l) = s
      net.be.g(l) += s
      l += 1
    }
    val aDeep = ws.act(depth - 1)
    val dDeep = ws.dAct(depth - 1)
    j = 0
    while (j < net.flat) {
      var s = 0.0
      var l2 = 0
      while (l2 < cfg.latent) { s += net.we.w(l2 * net.flat + j) * ws.dZ(l2); l2 += 1 }
      dDeep(j) = if (aDeep(j) > 0.0) s else 0.0
      l2 = 0
      while (l2 < cfg.latent) {
        net.we.g(l2 * net.flat + j) += ws.dZ(l2) * aDeep(j)
        l2 += 1
      }
      j += 1
    }
    i = 0
    while (i < dDeep.length) {
      net.convB(depth - 1).g(i / (net.hs(depth) * net.hs(depth))) += dDeep(i)
      i += 1
    }
    // conv stages, deep -> shallow
    var li = depth - 1
    while (li >= 0) {
      val aIn = if (li == 0) x else ws.act(li - 1)
      convBwdW(net.ch(li), net.ch(li + 1), net.hs(li), aIn, ws.dAct(li),
        net.convW(li).g)
      if (li > 0) {
        convBwdData(net.convW(li).w, net.ch(li), net.ch(li + 1), net.hs(li),
          ws.dAct(li), ws.dAct(li - 1))
        val hsq = net.hs(li) * net.hs(li)
        var i2 = 0
        while (i2 < ws.dAct(li - 1).length) {
          if (ws.act(li - 1)(i2) <= 0.0) ws.dAct(li - 1)(i2) = 0.0
          net.convB(li - 1).g(i2 / hsq) += ws.dAct(li - 1)(i2)
          i2 += 1
        }
      }
      li -= 1
    }
  }

  /** Fit on `fit` images (already normalized) and return the 2-D
    * latent for each of `embed`. Early stopping: no train-loss
    * improvement for `patience` epochs. */
  def fitEmbed(fit: Array[Array[Double]], embed: Array[Array[Double]],
      cfg: Config): Array[Array[Double]] =
    fitEmbedWithHistory(fit, embed, cfg)._1

  /** [[fitEmbed]] plus the per-epoch mean train MSE — the reference's
    * training-progress surface (app.py:599-613 prints per-epoch loss
    * lines into `autoencoder_hist`; here the history is a typed,
    * deterministic table instead of a Dash log). */
  def fitEmbedWithHistory(fit: Array[Array[Double]],
      embed: Array[Array[Double]],
      cfg: Config): (Array[Array[Double]], Array[Double]) = {
    require(fit.nonEmpty, "ConvAE.fitEmbed: empty fit set")
    require(fit.forall(_.length == cfg.imgSize * cfg.imgSize),
      s"ConvAE: images must be ${cfg.imgSize}x${cfg.imgSize}")
    val net = new Net(cfg)
    val ws = new Ws(net, cfg)
    val hist = trainInPlace(net, ws, fit, cfg)
    val z = embed.map { x =>
      forward(net, cfg, x, ws, latentOnly = true)
      ws.z.clone()
    }
    (z, hist)
  }

  /** Trained parameter tensors (in `Net.all` order) plus the
    * per-epoch history — a plain-arrays artifact a driver can
    * BROADCAST for the distributed projection path. Identical seeding
    * and training to [[fitEmbedWithHistory]], so
    * `encoder(weights)(x)` is bitwise the embedding that call would
    * produce for `x`. */
  def fitWeightsWithHistory(fit: Array[Array[Double]],
      cfg: Config): (Array[Array[Double]], Array[Double]) = {
    require(fit.nonEmpty, "ConvAE.fitWeights: empty fit set")
    require(fit.forall(_.length == cfg.imgSize * cfg.imgSize),
      s"ConvAE: images must be ${cfg.imgSize}x${cfg.imgSize}")
    val net = new Net(cfg)
    val ws = new Ws(net, cfg)
    val hist = trainInPlace(net, ws, fit, cfg)
    (net.all.map(_.w.clone()), hist)
  }

  /** Latent encoder over trained weight tensors: one Net + scratch
    * workspace allocated up front and REUSED per call — NOT
    * thread-safe; allocate one per task/partition (Spark tasks
    * consume their iterator single-threaded, so a per-partition
    * instance inside `mapPartitions` is the intended use). */
  def encoder(weights: Array[Array[Double]], cfg: Config): Array[Double] => Array[Double] = {
    val net = new Net(cfg)
    require(weights.length == net.all.length &&
      weights.indices.forall(i => weights(i).length == net.all(i).w.length),
      "ConvAE.encoder: weight shapes do not match the config")
    var i = 0
    while (i < weights.length) {
      System.arraycopy(weights(i), 0, net.all(i).w, 0, weights(i).length)
      i += 1
    }
    val ws = new Ws(net, cfg)
    x => {
      require(x.length == cfg.imgSize * cfg.imgSize,
        s"ConvAE.encoder: image must be ${cfg.imgSize}x${cfg.imgSize}")
      forward(net, cfg, x, ws, latentOnly = true)
      ws.z.clone()
    }
  }

  /** Mean reconstruction MSE over `fit` BEFORE and AFTER training —
    * the spec's loss-decreases contract (trains once). */
  def mseBeforeAfter(fit: Array[Array[Double]], cfg: Config): (Double, Double) = {
    val net = new Net(cfg)
    val ws = new Ws(net, cfg)
    var s0 = 0.0
    fit.foreach(x => s0 += forward(net, cfg, x, ws, latentOnly = false))
    trainInPlace(net, ws, fit, cfg)
    var s1 = 0.0
    fit.foreach(x => s1 += forward(net, cfg, x, ws, latentOnly = false))
    (s0 / fit.length, s1 / fit.length)
  }

  /** Finite-difference gradient check (spec hook): worst relative
    * error between the backprop gradient and the central-difference
    * numeric gradient over EVERY parameter, one image, fresh seeded
    * net. Near-zero grads (|both| < 1e-10) are skipped — relative
    * error is meaningless there. */
  private[graft] def gradCheck(cfg: Config, x: Array[Double],
      warmupEpochs: Int = 0): Double = {
    val net = new Net(cfg)
    val ws = new Ws(net, cfg)
    // warmup (round 13): at the FRESH init every bias is 0.0 and a
    // relu'd ConvT stage fed by an already-relu'd map (depth >= 3)
    // has cells whose whole input window is zero — pre-activation
    // EXACTLY 0.0, the relu kink, where a central difference on a
    // BIAS straddles the subgradient and the check is ill-posed
    // (weights never see it: a zero input annihilates their
    // perturbation term). A few Adam steps make every parameter
    // generic, off the kink; the backprop under test is unchanged.
    if (warmupEpochs > 0)
      trainInPlace(net, ws, Array(x),
        cfg.copy(epochs = warmupEpochs, patience = Int.MaxValue))
    net.all.foreach(p => java.util.Arrays.fill(p.g, 0.0))
    forward(net, cfg, x, ws, latentOnly = false)
    backward(net, cfg, x, ws)
    val eps = 1e-6
    var worst = 0.0
    net.all.foreach { p =>
      var k = 0
      while (k < p.w.length) {
        val orig = p.w(k)
        p.w(k) = orig + eps
        val lp = forward(net, cfg, x, ws, latentOnly = false)
        p.w(k) = orig - eps
        val lm = forward(net, cfg, x, ws, latentOnly = false)
        p.w(k) = orig
        val num = (lp - lm) / (2 * eps)
        val ana = p.g(k)
        if (math.abs(num) > 1e-10 || math.abs(ana) > 1e-10) {
          val rel = math.abs(ana - num) /
            math.max(1e-6, math.max(math.abs(num), math.abs(ana)))
          if (rel > worst) worst = rel
        }
        k += 1
      }
    }
    worst
  }

  /** The one training loop: seeded Fisher-Yates epoch shuffles,
    * minibatch Adam, plateau early-stop. Returns the per-epoch mean
    * train MSE (the training-history surface). */
  private def trainInPlace(net: Net, ws: Ws, fit: Array[Array[Double]],
      cfg: Config): Array[Double] = {
    val history = new scala.collection.mutable.ArrayBuffer[Double](cfg.epochs)
    val order = fit.indices.toArray
    val shuffleRnd = new java.util.Random(cfg.seed ^ 0x9e3779b97f4a7c15L)
    var best = Double.MaxValue
    var sincePlateau = 0
    var adamT = 0
    var epoch = 0
    while (epoch < cfg.epochs && sincePlateau <= cfg.patience) {
      var i = order.length - 1
      while (i > 0) {
        val j = shuffleRnd.nextInt(i + 1)
        val t = order(i); order(i) = order(j); order(j) = t
        i -= 1
      }
      var epochLoss = 0.0
      var bStart = 0
      while (bStart < order.length) {
        val bEnd = math.min(bStart + cfg.batchSize, order.length)
        net.all.foreach(p => java.util.Arrays.fill(p.g, 0.0))
        var b = bStart
        while (b < bEnd) {
          val x = fit(order(b))
          epochLoss += forward(net, cfg, x, ws, latentOnly = false)
          backward(net, cfg, x, ws)
          b += 1
        }
        val scale = 1.0 / (bEnd - bStart)
        adamT += 1
        val bc1 = 1.0 - math.pow(0.9, adamT)
        val bc2 = 1.0 - math.pow(0.999, adamT)
        net.all.foreach { p =>
          var k = 0
          while (k < p.w.length) {
            val g = p.g(k) * scale
            p.m(k) = 0.9 * p.m(k) + 0.1 * g
            p.v(k) = 0.999 * p.v(k) + 0.001 * g * g
            p.w(k) -= cfg.lr * (p.m(k) / bc1) / (math.sqrt(p.v(k) / bc2) + 1e-8)
            k += 1
          }
        }
        bStart = bEnd
      }
      epochLoss /= order.length
      history += epochLoss
      if (epochLoss < best - 1e-12) { best = epochLoss; sincePlateau = 0 }
      else sincePlateau += 1
      epoch += 1
    }
    history.toArray
  }
}
