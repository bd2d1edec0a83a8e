package graft.ml

/** Seeded pure-JVM convolutional AutoEncoder for the E3 slot
  * (reference: app.py:490-641 — Conv2D stride-2 stack → Dense(2)
  * latent → Conv2DTranspose mirror with sigmoid output, Adam + MSE,
  * early stopping on train loss). This is the faithful small-scale
  * regime behind [[Embedding.aeEmbed]]'s gate; the linear substitute
  * ([[Embedding.aeSubstitute]]) remains the scale fallback.
  *
  * Architecture (input S×S×1, S = imgSize, two stride-2 stages):
  * Conv(F1, 3×3, s2, same, relu) → Conv(F2, 3×3, s2, same, relu) →
  * flatten → Dense(2) [latent] → Dense(flat, linear) → reshape →
  * ConvT(F1, 3×3, s2, same, relu) → ConvT(1, 3×3, s2, same,
  * sigmoid). Deviations from the reference, documented in
  * COVERAGE.md: no BatchNorm (a seeded-but-stateful layer whose
  * running statistics would make the embedding depend on batch
  * composition — the determinism contract wins), two conv stages
  * sized to the engine's 8×8 imaging tier instead of Keras' 64×64
  * count-4 stack, and a bounded seeded fit sample (the CanonicalFit
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
    * seeded-sampled images (embedding still covers every input). */
  final case class Config(
      imgSize: Int = 8, f1: Int = 8, f2: Int = 16, latent: Int = 2,
      lr: Double = 3e-3, epochs: Int = 60, batchSize: Int = 32,
      patience: Int = 10, fitSample: Int = 256, seed: Long = 1L)

  /** One tensor's parameters + Adam state. */
  private final class P(val w: Array[Double]) {
    val m = new Array[Double](w.length)
    val v = new Array[Double](w.length)
    val g = new Array[Double](w.length) // accumulated minibatch grad
  }

  /** The full parameter set; field order IS the seeded init order. */
  private final class Net(cfg: Config) {
    val s0: Int = cfg.imgSize
    val s1: Int = (s0 + 1) / 2
    val s2: Int = (s1 + 1) / 2
    val flat: Int = s2 * s2 * cfg.f2
    private val rnd = new java.util.Random(cfg.seed)
    private def glorot(n: Int, fanIn: Int, fanOut: Int): Array[Double] = {
      val lim = math.sqrt(6.0 / (fanIn + fanOut))
      Array.fill(n)((rnd.nextDouble() * 2.0 - 1.0) * lim)
    }
    // conv weights live as w[cOut][cIn][ky][kx] flattened; the ConvT
    // layers store the REVERSE conv's weights (their big→small map)
    val w1 = new P(glorot(cfg.f1 * 1 * 9, 9, cfg.f1 * 9))
    val b1 = new P(new Array[Double](cfg.f1))
    val w2 = new P(glorot(cfg.f2 * cfg.f1 * 9, cfg.f1 * 9, cfg.f2 * 9))
    val b2 = new P(new Array[Double](cfg.f2))
    val we = new P(glorot(cfg.latent * flat, flat, cfg.latent))
    val be = new P(new Array[Double](cfg.latent))
    val wd = new P(glorot(flat * cfg.latent, cfg.latent, flat))
    val bd = new P(new Array[Double](flat))
    val t1 = new P(glorot(cfg.f2 * cfg.f1 * 9, cfg.f2 * 9, cfg.f1 * 9))
    val tb1 = new P(new Array[Double](cfg.f1))
    val t2 = new P(glorot(cfg.f1 * 1 * 9, cfg.f1 * 9, 9))
    val tb2 = new P(new Array[Double](1))
    val all: Array[P] = Array(w1, b1, w2, b2, we, be, wd, bd, t1, tb1, t2, tb2)
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
    val a1 = new Array[Double](cfg.f1 * net.s1 * net.s1)
    val a2 = new Array[Double](cfg.f2 * net.s2 * net.s2)
    val z = new Array[Double](cfg.latent)
    val g = new Array[Double](net.flat)
    val t1o = new Array[Double](cfg.f1 * net.s1 * net.s1)
    val out = new Array[Double](net.s0 * net.s0)
    // gradients mirrors
    val dOut = new Array[Double](net.s0 * net.s0)
    val dT1 = new Array[Double](cfg.f1 * net.s1 * net.s1)
    val dG = new Array[Double](net.flat)
    val dZ = new Array[Double](cfg.latent)
    val dA2 = new Array[Double](cfg.f2 * net.s2 * net.s2)
    val dA1 = new Array[Double](cfg.f1 * net.s1 * net.s1)
    val dX = new Array[Double](net.s0 * net.s0) // unused sink
  }

  /** Forward pass; x is the normalized S×S image. Returns MSE. When
    * `latentOnly`, stops after the encoder (embedding path). */
  private def forward(net: Net, cfg: Config, x: Array[Double], ws: Ws,
      latentOnly: Boolean): Double = {
    convFwd(net.w1.w, 1, cfg.f1, net.s0, x, ws.a1)
    var i = 0
    while (i < ws.a1.length) {
      val b = net.b1.w(i / (net.s1 * net.s1))
      val v = ws.a1(i) + b
      ws.a1(i) = if (v > 0) v else 0.0
      i += 1
    }
    convFwd(net.w2.w, cfg.f1, cfg.f2, net.s1, ws.a1, ws.a2)
    i = 0
    while (i < ws.a2.length) {
      val b = net.b2.w(i / (net.s2 * net.s2))
      val v = ws.a2(i) + b
      ws.a2(i) = if (v > 0) v else 0.0
      i += 1
    }
    var l = 0
    while (l < cfg.latent) {
      var s = net.be.w(l)
      var j = 0
      while (j < net.flat) { s += net.we.w(l * net.flat + j) * ws.a2(j); j += 1 }
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
    // ConvT1: small (f2, s2) → big (f1, s1); reverse-conv weights t1
    convBwdData(net.t1.w, cfg.f1, cfg.f2, net.s1, ws.g, ws.t1o)
    i = 0
    while (i < ws.t1o.length) {
      val v = ws.t1o(i) + net.tb1.w(i / (net.s1 * net.s1))
      ws.t1o(i) = if (v > 0) v else 0.0
      i += 1
    }
    convBwdData(net.t2.w, 1, cfg.f1, net.s0, ws.t1o, ws.out)
    var mse = 0.0
    i = 0
    while (i < ws.out.length) {
      val v = 1.0 / (1.0 + math.exp(-(ws.out(i) + net.tb2.w(0))))
      ws.out(i) = v
      val d = v - x(i)
      mse += d * d
      i += 1
    }
    mse / ws.out.length
  }

  /** Backward pass (call right after a full forward); accumulates
    * parameter grads into net.*.g. */
  private def backward(net: Net, cfg: Config, x: Array[Double], ws: Ws): Unit = {
    val nPix = ws.out.length
    var i = 0
    while (i < nPix) {
      val o = ws.out(i)
      ws.dOut(i) = (2.0 / nPix) * (o - x(i)) * o * (1.0 - o)
      net.tb2.g(0) += ws.dOut(i)
      i += 1
    }
    // ConvT2 (reverse conv maps big(f1,s1-as-out?) — its reverse conv
    // maps (1, s0) → (f1, s1)): dW = bwdW(A = dY big, dB = X small)
    convBwdW(1, cfg.f1, net.s0, ws.dOut, ws.t1o, net.t2.g)
    convFwd(net.t2.w, 1, cfg.f1, net.s0, ws.dOut, ws.dT1)
    i = 0
    while (i < ws.dT1.length) {
      if (ws.t1o(i) <= 0.0) ws.dT1(i) = 0.0
      net.tb1.g(i / (net.s1 * net.s1)) += ws.dT1(i)
      i += 1
    }
    convBwdW(cfg.f1, cfg.f2, net.s1, ws.dT1, ws.g, net.t1.g)
    convFwd(net.t1.w, cfg.f1, cfg.f2, net.s1, ws.dT1, ws.dG)
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
    j = 0
    while (j < net.flat) {
      var s = 0.0
      var l2 = 0
      while (l2 < cfg.latent) { s += net.we.w(l2 * net.flat + j) * ws.dZ(l2); l2 += 1 }
      ws.dA2(j) = if (ws.a2(j) > 0.0) s else 0.0
      l2 = 0
      while (l2 < cfg.latent) {
        net.we.g(l2 * net.flat + j) += ws.dZ(l2) * ws.a2(j)
        l2 += 1
      }
      j += 1
    }
    i = 0
    while (i < ws.dA2.length) {
      net.b2.g(i / (net.s2 * net.s2)) += ws.dA2(i)
      i += 1
    }
    convBwdW(cfg.f1, cfg.f2, net.s1, ws.a1, ws.dA2, net.w2.g)
    convBwdData(net.w2.w, cfg.f1, cfg.f2, net.s1, ws.dA2, ws.dA1)
    i = 0
    while (i < ws.dA1.length) {
      if (ws.a1(i) <= 0.0) ws.dA1(i) = 0.0
      net.b1.g(i / (net.s1 * net.s1)) += ws.dA1(i)
      i += 1
    }
    convBwdW(1, cfg.f1, net.s0, x, ws.dA1, net.w1.g)
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
  private[graft] def gradCheck(cfg: Config, x: Array[Double]): Double = {
    val net = new Net(cfg)
    val ws = new Ws(net, cfg)
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
